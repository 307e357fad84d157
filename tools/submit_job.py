"""spark-submit entry point for the NAER KG-construction pipeline.

Cluster launch (north_rule):

    python tools/package.py                       # build dist/naer_spark.zip
    spark-submit --master <cluster> \
        --py-files dist/naer_spark.zip \
        tools/submit_job.py \
        --input  <documents table path or iceberg name> \
        --gazetteer <csv path (modelElementID,componentName) or txt> \
        --output <triples output dir> \
        --checkpoint <stage-checkpoint root> \
        [--n-buckets 256] [--synth N_DOCS]

Local smoke (same code path):

    python tools/submit_job.py --synth 2000 --output /tmp/naer_out \
        --checkpoint /tmp/naer_ckpt

The job is resumable: re-running with the same --checkpoint recomputes
only doc buckets missing from the stage manifests (per-partition
lineage + metrics, plans/lineage.py). On a real cluster --input is an
Iceberg table; in the sandbox a parquet path works identically.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def load_gazetteer(path: str) -> list:
    """Component names from a CSV (2nd column, reference gazetteer
    format — test/.../GoldstandardParser.java:92-114) or one-per-line
    text file."""
    p = Path(path)
    names = set()
    lines = p.read_text().splitlines()
    if p.suffix == ".csv":
        for ln in lines[1:]:
            parts = ln.split(",")
            if len(parts) >= 2 and parts[1].strip():
                names.add(parts[1].strip())
    else:
        names = {ln.strip() for ln in lines if ln.strip()}
    return sorted(names)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", help="documents table (parquet path or iceberg name)")
    ap.add_argument("--gazetteer", help="gazetteer csv/txt path")
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--synth", type=int, help="generate N synthetic docs instead of --input")
    args = ap.parse_args(argv)

    from named_architecture_entity_recognition_spark.plans.lineage import (
        checkpointed_pipeline,
    )
    from named_architecture_entity_recognition_spark.session import get_spark
    from named_architecture_entity_recognition_spark.synth import (
        synth_documents,
        synth_gazetteer,
    )

    # under spark-submit the master comes from the launcher; get_spark
    # only fills it in when running standalone
    spark = get_spark("naer-kg-submit")

    if args.synth:
        docs = synth_documents(spark, args.synth, seed=42)
        gaz = synth_gazetteer(200)
    else:
        if not args.input:
            ap.error("--input or --synth required")
        from named_architecture_entity_recognition_spark.sources.lakehouse import (
            read_documents,
        )

        docs = read_documents(spark, args.input)
        gaz = load_gazetteer(args.gazetteer) if args.gazetteer else []

    t0 = time.time()
    triples = checkpointed_pipeline(
        docs, gaz, args.checkpoint, n_buckets=args.n_buckets
    )
    n = triples.count()
    from named_architecture_entity_recognition_spark.sources.lakehouse import (
        write_triples,
    )

    write_triples(triples.select("subj", "pred", "obj"), args.output)
    dt = time.time() - t0
    metrics = {}
    for stage in ("mentions", "entities", "triples"):
        mp = Path(args.checkpoint) / stage / "_naer_manifest.json"
        if mp.exists():
            metrics[stage] = json.loads(mp.read_text())
    out = {
        "n_triples": n,
        "sec": round(dt, 2),
        "triples_per_sec": round(n / dt, 1),
        "stage_metrics": metrics,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
