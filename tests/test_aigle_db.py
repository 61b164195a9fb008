"""Aigle PostGIS surface against a sqlite stand-in (VERDICT round-1 item
#6): the exact SQL control flow of the reference — live export transaction
with rollback (/root/reference/utils/export.py:48-115), model-registry
lookup (utils/s3.py:26-98) and geozone fallback query
(flair_zonal_detection/inference.py:229-252) — runs through aigle/db.py,
which binds to psycopg2/pg8000 in production and sqlite here.
"""

import os

import pytest

from flair_for_aigle_tpu.aigle.db import (
    Database,
    DatabaseError,
    fetch_geozones,
    lookup_model_row,
    sql_quote,
    _parse_pg_dsn,
)
from flair_for_aigle_tpu.aigle.export import Exporter
from flair_for_aigle_tpu.aigle.map import Mapper
from flair_for_aigle_tpu.geo.geos import box as geos_box


@pytest.fixture()
def db():
    d = Database.connect("sqlite://")
    d.execute(
        "CREATE TABLE detections.batch (id INTEGER PRIMARY KEY, batch_name "
        "TEXT, created_at TEXT, model_id INTEGER, batch_tiles_url TEXT, "
        "description TEXT)"
    )
    d.execute(
        "CREATE TABLE detections.inference (batch_id INTEGER, score REAL, "
        "object_type TEXT, geometry TEXT)"
    )
    yield d
    d.close()


def _records(n=7):
    return [
        {"geometry": geos_box(i, 0.0, i + 1.0, 1.0), "class_id": 6,
         "confidence": 0.1 * i}
        for i in range(n)
    ]


def test_sql_quote():
    assert sql_quote("l'eau d'ici") == "l''eau d''ici"


def test_parse_pg_dsn():
    kw = _parse_pg_dsn("postgresql://user:pw@dbhost:5433/aigle")
    assert kw == {"user": "user", "password": "pw", "host": "dbhost",
                  "port": 5433, "database": "aigle"}


def test_live_export_transaction(db, tmp_path):
    exporter = Exporter(detection_crs="EPSG:2154")
    exporter.export_batch_size = 3  # force multi-chunk inserts
    ctx = {"export_sql": True, "batch_name": "zone d'essai",  # quote in name
           "model_id": 42, "description": "runner's batch"}
    mapper = Mapper({i: f"c{i}" for i in range(19)}, simplify=True)
    exporter.export_to_aigle(_records(), "EPSG:2154", str(tmp_path),
                             mapper, ctx, db=db)

    batches = db.fetchall("select * from detections.batch")
    assert len(batches) == 1
    assert batches[0]["batch_name"] == "zone d'essai"
    assert batches[0]["model_id"] == 42
    rows = db.fetchall("select * from detections.inference")
    assert len(rows) == 7  # class 6 -> mapped, kept
    assert all(r["batch_id"] == batches[0]["id"] for r in rows)
    assert rows[0]["geometry"].startswith("SRID=2154;POLYGON")
    # GPKG dump still produced alongside the live export
    assert any(f.endswith(".gpkg") for f in os.listdir(tmp_path))


def test_export_rollback_on_failure(db, tmp_path):
    exporter = Exporter(detection_crs="EPSG:2154")
    ctx = {"export_sql": True, "batch_name": "b", "model_id": 1,
           "description": ""}
    # sabotage the detections insert: drop the inference table
    db.execute("DROP TABLE detections.inference")
    with pytest.raises(Exception):
        exporter.export_to_db(
            db,
            [{"geometry": geos_box(0, 0, 1, 1), "class_id": 16,
              "confidence": 0.5}],
            ctx,
        )
    # the batch row from step 1 must be rolled back (reference
    # export.py:107-115 transaction semantics)
    assert db.fetchall("select * from detections.batch") == []


def test_model_registry_lookup(db, tmp_path, monkeypatch):
    db.execute(
        "CREATE TABLE detections.model (id INTEGER PRIMARY KEY, "
        "model_path TEXT)"
    )
    db.execute("INSERT INTO detections.model VALUES (7, 's3://bucket/m7')")
    row = lookup_model_row(db, 7)
    assert row["model_path"] == "s3://bucket/m7"
    with pytest.raises(DatabaseError):
        lookup_model_row(db, 99)


def test_geozone_fallback_query(db, tmp_path, monkeypatch):
    db.execute(
        "CREATE TABLE detections.fr_geozone_view (id INTEGER, name TEXT, "
        "geometry TEXT, geo_zone_type TEXT, name_normalized TEXT, "
        "iso_code TEXT)"
    )
    db.execute(
        "INSERT INTO detections.fr_geozone_view VALUES "
        "(1, 'Aix', 'POLYGON((0 0,2 0,2 2,0 2,0 0))', 'commune', 'aix', "
        "'13001'), "
        "(2, 'Nice', 'POLYGON((5 5,6 5,6 6,5 6,5 5))', 'commune', 'nice', "
        "'06088')"
    )
    rows = fetch_geozones(db)
    assert len(rows) == 2 and rows[0]["iso_code"] == "13001"

    # end-to-end through load_geozone_contour with no cache file
    from flair_for_aigle_tpu.zonal.inference import load_geozone_contour

    monkeypatch.setenv("GEOZONES_SHAPEFILE", "")

    class Cfg:
        db_sources = str(tmp_path)
        geozones_codes = "13001"
        input_crs = "EPSG:2154"

    geoms = load_geozone_contour(Cfg(), db=db)
    assert len(geoms) == 1
    assert geoms[0].bounds == (0.0, 0.0, 2.0, 2.0)


def test_missing_db_gives_clear_error(tmp_path, monkeypatch):
    from flair_for_aigle_tpu.zonal.inference import load_geozone_contour

    monkeypatch.setenv("GEOZONES_SHAPEFILE", "absent.gpkg")
    monkeypatch.delenv("DB_STRING_PROD", raising=False)

    class Cfg:
        db_sources = str(tmp_path)

    with pytest.raises(FileNotFoundError, match="PostGIS fallback"):
        load_geozone_contour(Cfg())
