"""Corpus-hygiene job: the pre-training cleaning pass as one
spark-submit surface — paragraph-level dedup (C4 rule), benchmark
decontamination (GPT-3 appendix C), bigram-LM quality scoring
(CCNet), and an optional balanced stratified sample of the
survivors:

    spark-submit --py-files mtslake.zip mtslake/jobs/hygiene.py \
        --store /data/lake --docs /data/corpus \
        --benchmark /data/evals --out /data/clean \
        --max-contam-frac 0.05 --sample-per-stratum 100000

Outputs under --out:
    clean/        cleaned + filtered documents parquet
    scores/       per-doc LM coverage + contamination + dedup stats
    sample/       (if --sample-per-stratum) balanced (lang, source)
                  sample of the clean set
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from mtslake.dedup import decontaminate
from mtslake.jobs.common import base_parser, build_session
from mtslake.sessions import stratified_sample
from mtslake.textops import (
    lm_coverage_score,
    paragraph_dedup,
    train_bigram_lm,
)


def main(argv=None) -> None:
    p = base_parser("mtslake hygiene: dedup + decontaminate + LM-score")
    p.add_argument("--docs", required=True,
                   help="corpus documents parquet (doc_id, text, ...)")
    p.add_argument("--benchmark", default=None,
                   help="benchmark/eval docs parquet to decontaminate "
                        "against (doc_id, text)")
    p.add_argument("--out", required=True)
    p.add_argument("--paragraph-sep", default="\n\n")
    p.add_argument("--window-k", type=int, default=8)
    p.add_argument("--max-contam-frac", type=float, default=0.05)
    p.add_argument("--lm-train-pct", type=int, default=80)
    p.add_argument("--sample-per-stratum", type=int, default=None)
    args = p.parse_args(argv)
    spark = build_session("mtslake-hygiene", args)

    docs = spark.read.parquet(args.docs)
    extra = [c for c in docs.columns if c not in ("doc_id", "text")]

    deduped = paragraph_dedup(docs, sep=args.paragraph_sep)
    cleaned = deduped.join(docs.select("doc_id", *extra), "doc_id")

    scores = deduped.select("doc_id", "n_paragraphs", "n_dropped")
    if args.benchmark:
        bench = spark.read.parquet(args.benchmark)
        contam = decontaminate(cleaned, bench, k=args.window_k)
        scores = scores.join(
            contam.select("doc_id", "n_hit_windows", "contam_tokens",
                          "contam_frac", "is_contaminated"),
            "doc_id", "left")
        cleaned = cleaned.join(
            contam.where(F.col("contam_frac") > args.max_contam_frac)
            .select("doc_id"),
            "doc_id", "left_anti")

    lm = train_bigram_lm(cleaned, train_pct=args.lm_train_pct)
    lm_scores = lm_coverage_score(cleaned, lm)
    scores = scores.join(lm_scores, "doc_id", "left")

    cleaned.write.mode("overwrite").parquet(f"{args.out}/clean")
    scores.write.mode("overwrite").parquet(f"{args.out}/scores")
    # re-read the materialized output: counting (and sampling from)
    # the unmaterialized `cleaned` would re-execute the whole
    # dedup/decontaminate pipeline once per downstream use
    cleaned = spark.read.parquet(f"{args.out}/clean")
    n_in = docs.count()
    n_out = cleaned.count()
    print(f"hygiene: {n_in} docs in -> {n_out} clean "
          f"({n_in - n_out} removed)")

    if args.sample_per_stratum:
        strata = [c for c in ("lang", "source") if c in cleaned.columns]
        if strata:
            sample = stratified_sample(
                cleaned, strata, args.sample_per_stratum)
            sample.write.mode("overwrite").parquet(f"{args.out}/sample")
            n_sample = spark.read.parquet(f"{args.out}/sample").count()
            print(f"hygiene: sample {n_sample} rows "
                  f"({'x'.join(strata)} strata)")


if __name__ == "__main__":
    main(sys.argv[1:])
