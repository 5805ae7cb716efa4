"""End-to-end training-corpus curation: the pipeline a data team runs
over a raw document table before tokenizing — exact dedup, near-dup
cluster pruning, benchmark decontamination, quality gating and a
deterministic train/val/test split — composed from the operator family
in extras/docops.py (each stage is individually DuckDB-oracle-paired;
the composed pipeline is oracle-paired as the `curate_corpus` driver
entry and exposed as a spark-submit job in jobs/curate.py).

The reference engine has no curation surface (it indexes whatever the
crawler admits — SURVEY.md §2.1); this module is part of the
beyond-reference LLM-pipeline family (SURVEY.md §2.6).

Design rules (the 100 TB shapes):
- every per-doc statistic is map-only (array ops on the split column,
  no explode, no shuffle);
- the exact-dup keeper is one hash aggregate on md5(text) joined back
  by hash — both sides shuffle once on a uniform key;
- near-dup flags ride the LSH candidate-pair machinery (bounded
  candidates, broadcast-sized components — see docops.connected_components);
- decontamination is a broadcast semi-join of the benchmark's shingles
  against the training shingle stream (the eval side is benchmark-sized);
- all verdicts are deterministic pure functions of content + doc_id —
  re-running over a grown corpus never flips an old doc's exact_dup /
  low_quality / contaminated / split verdict (near-dup verdicts can
  flip only when a new cluster member arrives, which is the semantics
  a dedup pass wants).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from apt_search_engine_spark.extras.docops import (
    _SAMPLE_BUCKETS,
    _SPLIT_TRAIN,
    _SPLIT_VAL,
    _raw_arr,
    _sample_bucket,
    _shingles,
    connected_components,
    minhash_pairs_df,
)

# quality gate defaults: drop docs with fewer than MIN_TOKENS raw tokens
# or with more than half their tokens purely numeric. Integer-exact
# comparisons (n_digit * 100 > n_tokens * pct) so the Spark plan and the
# SQL oracle can never disagree on a float rounding.
MIN_TOKENS = 5
MAX_DIGIT_PCT = 50


def curate(
    docs: DataFrame,
    eval_docs: DataFrame | None = None,
    min_tokens: int = MIN_TOKENS,
    max_digit_pct: int = MAX_DIGIT_PCT,
) -> DataFrame:
    """Flag every document of `docs` (doc_id, text, ...) with the four
    curation verdicts and the split assignment:

      doc_id, n_tokens,
      exact_dup      - identical text to a lexicographically-smaller doc
      neardup_drop   - in an LSH near-dup cluster and not its keeper
                       (keeper = most raw tokens, tiebreak min doc_id)
      contaminated   - shares a word 3-gram with `eval_docs` (False when
                       no eval set is given)
      low_quality    - n_tokens < min_tokens OR digit share > max_digit_pct
      kept           - none of the above
      split          - deterministic train/val/test by md5(doc_id) bucket

    Flags are computed independently over the full frame (not
    sequentially gated): verdicts are reproducible in isolation and the
    exact/near-dup keepers coincide by construction (identical text =>
    identical shingles => same cluster, same tiebreak)."""
    arr = F.filter(_raw_arr(), lambda x: x != "")
    stats = docs.select(
        "doc_id",
        F.md5("text").alias("h"),
        F.size(arr).cast("long").alias("n_tokens"),
        F.size(F.filter(arr, lambda x: x.rlike("^[0-9]+$")))
        .cast("long")
        .alias("n_digit"),
    )

    keepers = stats.groupBy("h").agg(F.min("doc_id").alias("keeper"))
    flagged = stats.join(keepers, "h").select(
        "doc_id",
        "n_tokens",
        "n_digit",
        (F.col("doc_id") != F.col("keeper")).alias("exact_dup"),
    )

    comps = connected_components(minhash_pairs_df(docs))
    w = Window.partitionBy("component").orderBy(
        F.desc("n_tokens"), F.asc("doc_id")
    )
    nd_drops = (
        flagged.join(F.broadcast(comps), "doc_id")
        .select("doc_id", (F.row_number().over(w) != 1).alias("nd"))
        .filter("nd")
        .select("doc_id")
    )
    # no broadcast hint: the drop set is bounded by the CORPUS (a
    # duplicate-heavy crawl can flag most of it), not by anything small —
    # AQE still broadcasts at runtime when the set turns out tiny
    flagged = flagged.join(
        nd_drops.withColumn("neardup_drop", F.lit(True)),
        "doc_id",
        "left",
    ).withColumn("neardup_drop", F.coalesce("neardup_drop", F.lit(False)))

    if eval_docs is not None:
        eval_sh = _shingles(eval_docs).select("shingle").distinct()
        contaminated_docs = (
            _shingles(docs)
            .join(F.broadcast(eval_sh), "shingle", "left_semi")
            .select("doc_id")
            .distinct()
            .withColumn("contaminated", F.lit(True))
        )
        # eval_sh above is benchmark-bounded (broadcast is right); the
        # contaminated DOC set is corpus-bounded (one stop 3-gram in the
        # benchmark flags much of the corpus) — no broadcast hint
        flagged = flagged.join(
            contaminated_docs, "doc_id", "left"
        ).withColumn("contaminated", F.coalesce("contaminated", F.lit(False)))
    else:
        flagged = flagged.withColumn("contaminated", F.lit(False))

    low_q = (F.col("n_tokens") < min_tokens) | (
        F.col("n_digit") * 100 > F.col("n_tokens") * max_digit_pct
    )
    bucket = _sample_bucket(F.col("doc_id"))
    return flagged.select(
        "doc_id",
        "n_tokens",
        "exact_dup",
        "neardup_drop",
        "contaminated",
        low_q.alias("low_quality"),
        (
            ~(
                F.col("exact_dup")
                | F.col("neardup_drop")
                | F.col("contaminated")
                | low_q
            )
        ).alias("kept"),
        F.when(bucket < _SPLIT_TRAIN, "train")
        .when(bucket < _SPLIT_VAL, "val")
        .otherwise("test")
        .alias("split"),
    )


def curate_stats(verdicts: DataFrame) -> dict:
    """One-pass summary of a curate() frame — the numbers a pipeline
    run logs. Single aggregate job, no per-flag scans."""
    row = verdicts.agg(
        F.count("*").alias("docs_in"),
        F.sum(F.col("exact_dup").cast("long")).alias("exact_dups"),
        F.sum(F.col("neardup_drop").cast("long")).alias("neardup_drops"),
        F.sum(F.col("contaminated").cast("long")).alias("contaminated"),
        F.sum(F.col("low_quality").cast("long")).alias("low_quality"),
        F.sum(F.col("kept").cast("long")).alias("docs_kept"),
        F.sum((F.col("kept") & (F.col("split") == "train")).cast("long")).alias(
            "kept_train"
        ),
        F.sum((F.col("kept") & (F.col("split") == "val")).cast("long")).alias(
            "kept_val"
        ),
        F.sum((F.col("kept") & (F.col("split") == "test")).cast("long")).alias(
            "kept_test"
        ),
    ).first()
    return {k: int(row[k] or 0) for k in row.asDict()}
