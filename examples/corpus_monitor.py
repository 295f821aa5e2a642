"""Corpus quality/drift monitoring report — the recurring-ingest health
check a production training-data pipeline runs BEFORE admitting a new
crawl batch into the mix, composed entirely from registered,
oracle-verified operators:

- per-source distribution drift (PSI)          `corpus_source_psi`
- language-ID drift (confusion matrix)         `corpus_lang_confusion`
- gibberish / degenerate-text rate (entropy)   `text_entropy`
- engagement concentration (Pareto deciles)    `events_value_pareto`
- seasonal value outliers per (type, hour)     `events_seasonal_baseline`
- embedding class drift (label centroids)      `emb_label_drift`
- length inequality per source (Gini)          `corpus_doc_length_gini`
- boilerplate openings per source              `text_boilerplate_prefix`
- Zipf slope per language (token salad)        `text_zipf_fit`
- md5 bucket uniformity (the split meta-gate)  `sample_hash_uniformity`

Each section prints a compact verdict line a scheduler can grep and a
gate could alert on. At 100 TB every underlying plan is a single
corpus/fact pass into matrix-sized aggregates (see the pins in
tests/test_scale_plans.py) — the whole report is a handful of cheap
jobs, so running it per ingest batch costs ~one scan of the new data.

Run:  python examples/corpus_monitor.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ballista_delta_spark.queries.pipeline import (  # noqa: E402
    corpus_doc_length_gini,
    corpus_lang_confusion,
    corpus_source_psi,
    events_seasonal_baseline,
    events_value_pareto,
)
from ballista_delta_spark.queries.sampling import (  # noqa: E402
    sample_hash_uniformity,
)
from ballista_delta_spark.queries.similarity import emb_label_drift  # noqa: E402
from ballista_delta_spark.queries.text import (  # noqa: E402
    text_boilerplate_prefix,
    text_entropy,
    text_zipf_fit,
)
from ballista_delta_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("corpus-monitor")
    spark.sparkContext.setLogLevel("ERROR")

    print(f"== corpus monitor over {sf} ==")

    psi = corpus_source_psi(spark, sf).orderBy(F.desc("psi")).collect()
    worst = psi[0]
    print(f"[drift] {len(psi)} sources; worst psi={worst['psi']:.4f} "
          f"({worst['source']}, n={worst['n_docs']})")
    print(f"drift_alert={'YES' if worst['psi'] > 0.25 else 'no'}")

    conf = corpus_lang_confusion(spark, sf).collect()
    agree = sum(r["n"] for r in conf if r["lang"] == r["lang_pred"])
    total = sum(r["n"] for r in conf)
    print(f"[langid] label-agreement={agree / total:.3f} over {total} docs")

    ent = text_entropy(spark, sf)
    kept = ent.filter("keep").count()
    n_docs = ent.count()
    print(f"[entropy] keep-rate={kept / n_docs:.3f} ({kept}/{n_docs})")

    par = events_value_pareto(spark, sf).orderBy("decile").collect()
    print(f"[pareto] top-decile value share={par[0]['share_of_value']:.3f}; "
          f"top-3 cumulative={par[2]['cum_share']:.3f}")

    seas = events_seasonal_baseline(spark, sf)
    flagged = seas.agg(F.sum("n_flagged")).collect()[0][0]
    cells = seas.count()
    print(f"[seasonal] {flagged} value outliers across {cells} "
          f"(type,hour) cells")

    drift = emb_label_drift(spark, sf).orderBy(F.desc("offset_norm")).collect()
    print(f"[embeddings] {len(drift)} labels; max centroid offset="
          f"{drift[0]['offset_norm']:.4f} (label {drift[0]['label']})")

    gini = corpus_doc_length_gini(spark, sf).orderBy(F.desc("gini")).collect()
    print(f"[inequality] worst length-gini={gini[0]['gini']:.3f} "
          f"({gini[0]['source']})")

    bp = text_boilerplate_prefix(spark, sf).orderBy(F.desc("doc_share")).collect()
    if bp:
        print(f"[boilerplate] worst shared opening covers "
              f"{bp[0]['doc_share']:.1%} of {bp[0]['source']}")
    else:
        print("[boilerplate] no repeated openings above the floor")

    zipf = text_zipf_fit(spark, sf).collect()
    worst_z = min(zipf, key=lambda r: r["fit_r2"])
    print(f"[zipf] slopes "
          + ", ".join(f"{r['lang']}={r['zipf_slope']:.2f}" for r in zipf)
          + f"; weakest fit r2={worst_z['fit_r2']:.3f} ({worst_z['lang']})")

    uni = sample_hash_uniformity(spark, sf).collect()
    bad = [r for r in uni if not r["uniform_ok"]]
    print(f"[hash] bucket uniformity "
          f"{'OK' if not bad else 'FAILED: ' + str(bad)} "
          f"across {len(uni)} key families")

    print(f"monitor_ok=1 sources={len(psi)} docs={n_docs} "
          f"entropy_keep={kept} outliers={flagged}")


if __name__ == "__main__":
    main()
