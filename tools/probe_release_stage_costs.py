#!/usr/bin/env python
"""Per-stage cost breakdown of the three release-train bench entries
(guide §1: measure first).  Reproduces bench.py's exact setup (same
docs, same increment shape, same barrier-cold protocol) and times each
component of corpus_release / corpus_release_append in isolation:

    python tools/probe_release_stage_costs.py [n_runs]

Stages timed (full-release):
  curate_write   curate_documents -> write_training_shards (+manifest)
  lm_train       unigram_lm over released rows + model write
  card_full      corpus_card(released, lm_model=ref) [glob+ppl+ngram passes]
  card_partial   corpus_card_partial(released, ...) write
  packing_agg    the inline two-level packing aggregate

Stages timed (append):
  gate_exact     dedup_exact_against_index over the increment
  curate_inc     curate_documents(gated) localCheckpoint
  survivors      semi-join + count
  shard_write    write_training_shards(inc_dir)
  admit_exact    append_exact_index
  inc_partial    corpus_card_partial(inc rows) write
  manifest_full  _refresh_manifest_full
  card_refresh_full   corpus_card(read_release) + write  [refresh_card=True]
  card_refresh_inc    merge_card_partials trail + write  [="incremental"]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from bigdataproject_formula1_telemetry_spark import get_spark, io
    from bigdataproject_formula1_telemetry_spark.operators import (
        dedup as _dedup,
        exact_index as _eidx,
        lm as _L,
    )
    from bigdataproject_formula1_telemetry_spark.plans import pipelines as P

    spark = get_spark(app_name="probe-release-stages")
    spark.sparkContext.setLogLevel("ERROR")

    docs = io.read_table(spark, sf_dir, "documents")
    times: dict[str, list[float]] = {}

    def t(stage: str, fn):
        t0 = time.perf_counter()
        out = fn()
        times.setdefault(stage, []).append(time.perf_counter() - t0)
        return out

    with tempfile.TemporaryDirectory() as rtmp:
        rel = os.path.join(rtmp, "release")
        for run in range(n_runs):
            _dedup.release_barriers()
            # ── full release, componentized (mirrors corpus_release) ──
            packed = P.curate_documents(docs)
            manifest = t(
                "curate_write", lambda: P.write_training_shards(packed, rel)
            )
            manifest.count()
            released = spark.read.parquet(os.path.join(rel, "data"))
            ref_lm_path = os.path.join(rel, "ppl_model")
            t(
                "lm_train",
                lambda: _L.unigram_lm(
                    released, text_col="chunk_text", vocab_size=50_000
                )
                .write.mode("overwrite")
                .parquet(ref_lm_path),
            )
            ref_lm = spark.read.parquet(ref_lm_path)
            t(
                "card_full",
                lambda: P.corpus_card(
                    released,
                    text_col="chunk_text",
                    lang_col=None,
                    lm_model=ref_lm,
                ).write.format("noop").mode("overwrite").save(),
            )
            t(
                "card_partial",
                lambda: P.corpus_card_partial(
                    released,
                    text_col="chunk_text",
                    lang_col=None,
                    token_budget=1024.0,
                    ppl_model=ref_lm,
                )
                .write.mode("overwrite")
                .parquet(os.path.join(rel, "card_partials", "base")),
            )

            def _packing():
                bins = released.groupBy("pack_shard", "seq_id").agg(
                    F.sum("n_tokens").alias("__fill"),
                    F.max(F.col("oversize").cast("int")).alias("__over"),
                )
                bins.agg(
                    F.count(F.lit(1)).alias("n"),
                    F.avg("__fill").alias("m"),
                    F.sum("__over").alias("o"),
                ).first()

            t("packing_agg", _packing)

        # a real base release for the append probes
        _dedup.release_barriers()
        import shutil

        shutil.rmtree(rel, ignore_errors=True)
        P.corpus_release(docs, rel)

        docs_r = docs.select("doc_id", "text")
        epath = os.path.join(rtmp, "eidx")
        _eidx.build_exact_index(docs_r, epath, expected_items=1_000_000)
        head_r = docs_r.orderBy("doc_id").limit(250)

        def inc_for(i: int):
            return (
                head_r.select(
                    (F.col("doc_id") + 50_000_000).alias("doc_id"), "text"
                )
                .unionByName(
                    head_r.select(
                        (F.col("doc_id") + 60_000_000 + i * 1_000).alias(
                            "doc_id"
                        ),
                        F.concat_ws(
                            " ",
                            F.lit(f"probe release increment {i}"),
                            F.col("doc_id").cast("string"),
                            F.col("text"),
                        ).alias("text"),
                    )
                )
                .localCheckpoint(eager=True)
            )

        for run in range(n_runs):
            _dedup.release_barriers()
            inc = inc_for(run)
            inc_id = f"probe{run}"
            gated = t(
                "gate_exact",
                lambda: _eidx.dedup_exact_against_index(
                    spark, inc, epath, "text", "doc_id", exclude_inc=inc_id
                ).localCheckpoint(eager=True),
            )
            packed = t(
                "curate_inc",
                lambda: P.curate_documents(gated).localCheckpoint(eager=True),
            )
            inc_dir = os.path.join(rel, "increments", inc_id)
            survivors = t(
                "survivors",
                lambda: inc.join(
                    packed.select("doc_id").distinct(), "doc_id", "semi"
                ).localCheckpoint(eager=True),
            )
            survivors.count()
            t("shard_write", lambda: P.write_training_shards(packed, inc_dir))
            t(
                "admit_exact",
                lambda: _eidx.append_exact_index(
                    survivors, epath, increment_id=inc_id,
                    text_col="text", id_col="doc_id",
                ),
            )
            ref_lm = spark.read.parquet(os.path.join(rel, "ppl_model"))
            t(
                "inc_partial",
                lambda: P.corpus_card_partial(
                    spark.read.parquet(os.path.join(inc_dir, "data")),
                    text_col="chunk_text",
                    lang_col=None,
                    token_budget=1024.0,
                    ppl_model=ref_lm,
                )
                .write.mode("overwrite")
                .parquet(os.path.join(rel, "card_partials", inc_id)),
            )
            t("manifest_full", lambda: P._refresh_manifest_full(spark, rel))
            released_all = P.read_release(spark, rel)
            t(
                "card_refresh_full",
                lambda: P.corpus_card(
                    released_all, text_col="chunk_text", lang_col=None
                )
                .write.mode("overwrite")
                .parquet(os.path.join(rel, "card")),
            )
            t(
                "card_refresh_inc",
                lambda: P.merge_card_partials(
                    spark.read.parquet(os.path.join(rel, "card_partials", "*"))
                )
                .write.format("noop")
                .mode("overwrite")
                .save(),
            )

    for stage, vals in times.items():
        print(
            f"{stage:20s} min={min(vals):7.3f}  "
            + " ".join(f"{v:7.3f}" for v in vals)
        )
    spark.stop()


if __name__ == "__main__":
    main()
