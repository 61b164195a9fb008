"""First-party Postgres wire client (aigle/pgwire.py) against an
in-process fake server: SCRAM-SHA-256 auth, type decoding, and the exact
live-export SQL/transaction flow the reference emits
(/root/reference/utils/export.py:48-115)."""

import base64
import hashlib
import hmac
import os
import re
import socket
import struct
import threading

import pytest

from flair_for_aigle_tpu.aigle.db import Database
from flair_for_aigle_tpu.aigle.export import Exporter
from flair_for_aigle_tpu.aigle.pgwire import DatabaseError, connect

USER, PASSWORD = "aigle", "s3cret#quote'"


def _msg(tag: bytes, payload: bytes = b"") -> bytes:
    return tag + struct.pack("!I", len(payload) + 4) + payload


def _row_desc(*cols):
    body = struct.pack("!H", len(cols))
    for name, typ in cols:
        body += name.encode() + b"\x00"
        body += struct.pack("!IHIhiH", 0, 0, typ, -1, -1, 0)
    return _msg(b"T", body)


def _data_row(*vals):
    body = struct.pack("!H", len(vals))
    for v in vals:
        if v is None:
            body += struct.pack("!i", -1)
        else:
            enc = str(v).encode()
            body += struct.pack("!i", len(enc)) + enc
    return _msg(b"D", body)


def _complete(status: str) -> bytes:
    return _msg(b"C", status.encode() + b"\x00")


def _ready(state: bytes = b"I") -> bytes:
    return _msg(b"Z", state)


def _error(message: str) -> bytes:
    fields = b"SERROR\x00C42601\x00M" + message.encode() + b"\x00\x00"
    return _msg(b"E", fields)


class FakePG(threading.Thread):
    """Single-connection protocol-v3 server with SCRAM-SHA-256 auth and a
    scriptable query handler. Records every received query."""

    def __init__(self, handler=None, auth: str = "scram"):
        super().__init__(daemon=True)
        self.queries: list[str] = []
        self.handler = handler or (lambda sql: [_complete("SELECT 0")])
        self.auth = auth
        self._lsock = socket.socket()
        self._lsock.bind(("127.0.0.1", 0))
        self._lsock.listen(1)
        self.port = self._lsock.getsockname()[1]
        self.error: Exception | None = None

    # --- framing ----------------------------------------------------------
    def _recv_exact(self, n):
        while len(self._rbuf) < n:
            chunk = self._c.recv(65536)
            if not chunk:
                raise ConnectionError("client closed")
            self._rbuf += chunk
        out, self._rbuf = self._rbuf[:n], self._rbuf[n:]
        return out

    def _read_startup(self):
        (length,) = struct.unpack("!I", self._recv_exact(4))
        return self._recv_exact(length - 4)

    def _read_msg(self):
        head = self._recv_exact(5)
        (length,) = struct.unpack("!I", head[1:5])
        return head[:1], self._recv_exact(length - 4)

    # --- auth -------------------------------------------------------------
    def _scram_exchange(self):
        self._c.sendall(_msg(b"R", struct.pack("!I", 10)
                             + b"SCRAM-SHA-256\x00\x00"))
        tag, body = self._read_msg()
        assert tag == b"p"
        end = body.index(b"\x00")
        assert body[:end] == b"SCRAM-SHA-256"
        (ln,) = struct.unpack("!I", body[end + 1:end + 5])
        client_first = body[end + 5:end + 5 + ln].decode()
        assert client_first.startswith("n,,")
        first_bare = client_first[3:]
        cnonce = dict(kv.split("=", 1)
                      for kv in first_bare.split(","))["r"]
        snonce = cnonce + base64.b64encode(os.urandom(9)).decode()
        salt = os.urandom(16)
        iters = 4096
        server_first = (f"r={snonce},s={base64.b64encode(salt).decode()},"
                        f"i={iters}")
        self._c.sendall(_msg(b"R", struct.pack("!I", 11)
                             + server_first.encode()))
        tag, body = self._read_msg()
        assert tag == b"p"
        client_final = body.decode()
        m = re.fullmatch(r"(c=biws,r=([^,]+)),p=(.+)", client_final)
        assert m and m.group(2) == snonce
        salted = hashlib.pbkdf2_hmac("sha256", PASSWORD.encode(), salt, iters)
        client_key = hmac.digest(salted, b"Client Key", "sha256")
        stored_key = hashlib.sha256(client_key).digest()
        auth_msg = ",".join([first_bare, server_first, m.group(1)])
        want_sig = hmac.digest(stored_key, auth_msg.encode(), "sha256")
        proof = base64.b64decode(m.group(3))
        recovered = bytes(a ^ b for a, b in zip(proof, want_sig))
        assert hashlib.sha256(recovered).digest() == stored_key, \
            "client proof rejected"
        server_key = hmac.digest(salted, b"Server Key", "sha256")
        v = base64.b64encode(
            hmac.digest(server_key, auth_msg.encode(), "sha256")).decode()
        self._c.sendall(_msg(b"R", struct.pack("!I", 12)
                             + f"v={v}".encode()))
        self._c.sendall(_msg(b"R", struct.pack("!I", 0)))

    def run(self):
        try:
            self._c, _ = self._lsock.accept()
            self._rbuf = b""
            startup = self._read_startup()
            assert b"user\x00" + USER.encode() in startup
            if self.auth == "scram":
                self._scram_exchange()
            else:
                self._c.sendall(_msg(b"R", struct.pack("!I", 0)))
            self._c.sendall(
                _msg(b"S", b"server_version\x0016.0\x00") + _ready()
            )
            in_tx = False
            while True:
                tag, body = self._read_msg()
                if tag == b"X":
                    break
                if tag != b"Q":
                    continue
                sql = body.rstrip(b"\x00").decode()
                self.queries.append(sql)
                up = sql.strip().upper()
                if up.startswith("BEGIN") or up.startswith("START"):
                    in_tx = True
                    self._c.sendall(_complete("BEGIN") + _ready(b"T"))
                    continue
                if up.startswith(("COMMIT", "ROLLBACK")):
                    in_tx = False
                    self._c.sendall(_complete(up.split()[0]) + _ready())
                    continue
                out = b"".join(self.handler(sql))
                self._c.sendall(out + _ready(b"T" if in_tx else b"I"))
            self._c.close()
        except Exception as e:  # surfaced by the test
            self.error = e
            try:
                self._c.close()  # unblock the client immediately
            except Exception:
                pass
        finally:
            self._lsock.close()


def test_scram_auth_and_type_decoding():
    def handler(sql):
        return [
            _row_desc(("n", 23), ("x", 701), ("ok", 16), ("s", 25),
                      ("none", 23)),
            _data_row(7, "1.5", "t", "text", None),
            _complete("SELECT 1"),
        ]

    srv = FakePG(handler)
    srv.start()
    conn = connect(user=USER, host="127.0.0.1", port=srv.port,
                   database="aigle", password=PASSWORD)
    cur = conn.cursor()
    cur.execute("select 1")
    assert cur.fetchall() == [(7, 1.5, True, "text", None)]
    conn.close()
    srv.join(timeout=10)
    assert srv.error is None


def test_bad_password_rejected():
    srv = FakePG(auth="scram")
    srv.start()
    with pytest.raises((DatabaseError, ConnectionError, OSError)):
        connect(user=USER, host="127.0.0.1", port=srv.port,
                password="wrong")
    # server asserts the proof; its thread records the failure
    srv.join(timeout=10)
    assert srv.error is not None


def test_live_export_transaction_reference_sql(tmp_path):
    """Full Exporter live path over the wire: BEGIN -> batch INSERT
    RETURNING id -> chunked detections INSERT -> COMMIT, with the exact
    statement shapes of reference export.py:48-71."""
    def handler(sql):
        if "RETURNING id" in sql:
            return [_row_desc(("id", 23)), _data_row(42),
                    _complete("INSERT 0 1")]
        return [_complete("INSERT 0 2")]

    srv = FakePG(handler)
    srv.start()
    db = Database.connect(
        f"postgresql://{USER}:{PASSWORD.replace('/', '')}@127.0.0.1:"
        f"{srv.port}/aigle"
    )
    from flair_for_aigle_tpu.geo import geos

    exporter = Exporter(detection_crs="EPSG:2154")
    exporter.target_export_crs = "EPSG:2154"
    ctx = {"batch_name": "zone'29", "model_id": 3,
           "description": "run desc"}
    sq = geos.polygon([(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)])
    work = [{"geometry": sq, "class_id": 16, "confidence": 0.5},
            {"geometry": sq, "class_id": 16, "confidence": 0.25}]
    batch_id = exporter.export_to_db(db, work, ctx)
    db.close()
    srv.join(timeout=10)
    assert srv.error is None
    assert batch_id == 42

    assert srv.queries[0] == "BEGIN"
    batch_sql = srv.queries[1]
    assert batch_sql.startswith(
        "INSERT INTO detections.batch (id, batch_name, created_at, "
        "model_id, batch_tiles_url, description) VALUES("
        "nextval('detections.batch_id_seq'::regclass), 'zone''29', "
    )
    assert batch_sql.rstrip(";").endswith(
        "3, '', 'run desc') RETURNING id")
    det_sql = srv.queries[2]
    assert det_sql.startswith(
        "INSERT INTO detections.inference "
        "(batch_id, score, object_type, geometry) VALUES"
    )
    assert "SRID=2154;POLYGON" in det_sql
    assert "(42, " in det_sql
    assert srv.queries[3] == "COMMIT"


def test_export_error_rolls_back():
    def handler(sql):
        if "RETURNING id" in sql:
            return [_row_desc(("id", 23)), _data_row(42),
                    _complete("INSERT 0 1")]
        if "detections.inference" in sql:
            return [_error("permission denied for table inference")]
        return [_complete("SELECT 0")]

    srv = FakePG(handler)
    srv.start()
    db = Database.connect(
        f"postgresql://{USER}:{PASSWORD.replace('/', '')}@127.0.0.1:"
        f"{srv.port}/aigle"
    )
    from flair_for_aigle_tpu.geo import geos

    exporter = Exporter(detection_crs="EPSG:2154")
    exporter.target_export_crs = "EPSG:2154"
    sq = geos.polygon([(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)])
    with pytest.raises(Exception, match="permission denied"):
        exporter.export_to_db(
            db, [{"geometry": sq, "class_id": 16, "confidence": 1.0}],
            {"batch_name": "b", "model_id": 1, "description": ""},
        )
    db.close()
    srv.join(timeout=10)
    assert srv.error is None
    assert srv.queries[-1] == "ROLLBACK"


def test_model_registry_and_geozones_over_wire():
    def handler(sql):
        if "detections.model" in sql:
            return [
                _row_desc(("id", 23), ("model_path", 25), ("name", 25)),
                _data_row(3, "s3://bucket/models/m3", "swin"),
                _complete("SELECT 1"),
            ]
        if "fr_geozone_view" in sql:
            return [
                _row_desc(("id", 23), ("name", 25), ("geometry", 25),
                          ("geo_zone_type", 25), ("name_normalized", 25),
                          ("iso_code", 25)),
                _data_row(1, "Brest", "POLYGON((0 0,1 0,1 1,0 1,0 0))",
                          "commune", "brest", "29019"),
                _complete("SELECT 1"),
            ]
        return [_complete("SELECT 0")]

    srv = FakePG(handler)
    srv.start()
    db = Database.connect(
        f"postgresql://{USER}:{PASSWORD.replace('/', '')}@127.0.0.1:"
        f"{srv.port}/aigle"
    )
    from flair_for_aigle_tpu.aigle.db import fetch_geozones, lookup_model_row

    row = lookup_model_row(db, 3)
    assert row["model_path"] == "s3://bucket/models/m3"
    zones = fetch_geozones(db)
    assert zones[0]["iso_code"] == "29019"
    assert zones[0]["geometry"].startswith("POLYGON")
    # ST_AsText on the wire (PostGIS dialect)
    assert any("ST_AsText(geometry)" in q for q in srv.queries)
    db.close()
    srv.join(timeout=10)
    assert srv.error is None
