#!/usr/bin/env python
"""spark-submit entry point for the curation stage: extracted corpus →
training shards.

Runs downstream of jobs/run_extraction.py over a snapshot store (or
any parquet of extracted documents) and applies the curation tier
end-to-end:

    [--url-gates] URL hygiene + domain blocklist (ml/urlfilters)
    → [--domain-cap N] per-domain cap (content-addressed)
    → [--mojibake] cp1252-as-UTF-8 encoding repair (ml/mojibake)
    → [--nfc] Unicode NFC + whitespace normalization (ml/normalize)
    → [--line-filter] C4 line gates (ml/linefilters)
    → [--paragraph-dedup] corpus-wide keep-first paragraph dedup
      (ml/paradedup)
    → [--sentence-dedup] corpus-frequency sentence removal
      (ml/sentdedup)
    → [--blocklist FILE] C4 banned-term document drop (ml/blocklist)
    → [--lm-filter] drop LM-surprisal tail bucket (ml/quality_lm)
    → [--nb-filter] drop NB-classifier negatives (ml/quality_classifier)
    → C4/Gopher document gates (ml/webfilters.web_filter_signals)
    → exact dedup winners (first url per sha256)
    → optional PII redaction (ml/webfilters.redact_pii)
    → [--secrets-gate] drop documents with flagged high-entropy
      credentials (ml/secrets)
    → deterministic train/valid/test hash split
    → [--leakage-audit] train→eval 4-gram leakage report in the
      summary JSON (ml/leakage)
    → [--doremi-report DIR] DoReMi domain-quota table over the curated
      corpus (ml/doremi)
    → [--unimax-report DIR] UniMax per-language token quotas over the
      curated corpus (ml/mixing.plan_unimax; needs --lang-col)
    → [--mirror-report] host mirror pairs (ml/mirrors) in the summary
      JSON — detected on the PRE-dedup corpus, where the shared
      hashes still exist (exact dedup later collapses them)
    → [--datasheet] one-row corpus composition card (ml/datasheet)
      over the SHIPPED corpus in the summary JSON
    → partitioned, size-bounded shard write (operators/sinks)

and prints one JSON summary line (per-split yields) — the same report
shape as the `training_yield_report` driver query.

    spark-submit --py-files dist/readur_spark.zip jobs/run_curation.py \
        --input  /data/extracted_store \
        --output /data/training_shards \
        [--redact-pii] [--min-words 50] [--fmt parquet]

Local smoke test:
    PYTHONPATH=. python jobs/run_curation.py \
        --input /tmp/out --output /tmp/shards --cpus 8
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="readur_spark curation job")
    p.add_argument("--input", required=True,
                   help="snapshot-store root or extracted-docs parquet")
    p.add_argument("--output", required=True, help="shard layout root")
    p.add_argument("--text-col", default="extracted_text")
    p.add_argument("--url-col", default="url")
    p.add_argument("--min-words", type=int, default=50)
    p.add_argument("--redact-pii", action="store_true")
    p.add_argument("--url-gates", action="store_true",
                   help="apply URL hygiene gates (ml/urlfilters) first")
    p.add_argument("--domain-blocklist", default=None,
                   help="text file of blocked registrable domains, one "
                        "per line (used with --url-gates)")
    p.add_argument("--domain-cap", type=int, default=None,
                   help="keep at most N docs per registrable domain "
                        "(content-addressed)")
    p.add_argument("--mojibake", action="store_true",
                   help="repair cp1252-as-UTF-8 encoding damage before "
                        "normalization (ftfy recipe, ml/mojibake)")
    p.add_argument("--paragraph-dedup", action="store_true",
                   help="remove every non-first occurrence of corpus-"
                        "duplicated paragraphs (Gopher recipe, "
                        "ml/paradedup)")
    p.add_argument("--nfc", action="store_true",
                   help="Unicode NFC + whitespace normalization before "
                        "hashing/gating")
    p.add_argument("--line-filter", action="store_true",
                   help="apply the C4 line gates to each document")
    p.add_argument("--sentence-dedup", action="store_true",
                   help="remove corpus-frequent sentences (>= 3 docs, "
                        ">= 3 words; CCNet/Dolma recipe, ml/sentdedup)")
    p.add_argument("--blocklist", default=None, metavar="FILE",
                   help="text file of banned terms (unigrams or "
                        "two-word phrases), one per line; drop any doc "
                        "with a hit (C4 recipe, ml/blocklist)")
    p.add_argument("--lm-filter", action="store_true",
                   help="drop LM-surprisal 'tail' bucket docs "
                        "(ml/quality_lm, corpus-trained)")
    p.add_argument("--soft-dedup-cap", type=int, default=None,
                   metavar="MFP",
                   help="drop documents whose SoftDedup gram commonness "
                        "exceeds MFP milli-units (e.g. 3000 = content "
                        "repeated ~3x corpus-wide; ml/softdedup.py)")
    p.add_argument("--nb-filter", action="store_true",
                   help="drop docs the gate-distilled NB quality "
                        "classifier scores negative "
                        "(ml/quality_classifier, corpus-trained)")
    p.add_argument("--license-gate", choices=["permissive", "tagged"],
                   default=None,
                   help="gate on the license columns run_extraction "
                        "--license-signals attached: 'permissive' "
                        "keeps redistribution-safe grants only, "
                        "'tagged' keeps any page with a license link")
    p.add_argument("--code-route", choices=["exclude", "only"],
                   default=None,
                   help="route by the integer code-likeness score "
                        "(ml/codemath.py): 'exclude' drops code-bearing "
                        "docs (prose corpus), 'only' keeps nothing else "
                        "(code corpus). Runs BEFORE the prose gates, "
                        "which would otherwise delete code")
    p.add_argument("--math-route", choices=["exclude", "only"],
                   default=None,
                   help="same routing on the LaTeX/MathML math signals")
    p.add_argument("--doremi-report", default=None, metavar="DIR",
                   help="also write a DoReMi-style domain-reweighting "
                        "table (per-host pooled KN surprisal, excess "
                        "over the corpus, EG tilt, exact Hamilton "
                        "token quotas; ml/doremi.py) computed over the "
                        "CURATED corpus to DIR (parquet)")
    p.add_argument("--doremi-budget", type=int, default=1_000_000,
                   help="token budget the --doremi-report quotas sum "
                        "to exactly")
    p.add_argument("--secrets-gate", action="store_true",
                   help="drop documents whose detect-secrets-style "
                        "entropy scan flags a credential candidate "
                        "(ml/secrets) — the pre-training scrub gate")
    p.add_argument("--unimax-report", default=None, metavar="DIR",
                   help="write the UniMax per-language token-quota "
                        "table (ml/mixing.plan_unimax) over the "
                        "curated corpus to DIR as parquet")
    p.add_argument("--unimax-budget", type=int, default=None,
                   help="token budget for --unimax-report (default: "
                        "half the curated corpus's tokens)")
    p.add_argument("--lang-col", default="lang",
                   help="language column for --unimax-report (must "
                        "exist on the input; extraction emits it "
                        "when the source table carries lang)")
    p.add_argument("--mirror-report", action="store_true",
                   help="append host mirror pairs (shared exact-hash "
                        "containment per host pair, ml/mirrors) to "
                        "the summary JSON; measured before exact "
                        "dedup, which would erase the evidence")
    p.add_argument("--datasheet", action="store_true",
                   help="append the one-row corpus composition card "
                        "(ml/datasheet) over the shipped corpus to "
                        "the summary JSON")
    p.add_argument("--leakage-audit", action="store_true",
                   help="append a per-split train→eval 4-gram leakage "
                        "report (ml/leakage.py) to the summary JSON — "
                        "certifies the held-out splits before their "
                        "loss is trusted")
    p.add_argument("--fmt", choices=["parquet", "json"], default="parquet")
    p.add_argument("--max-records-per-file", type=int, default=100_000)
    p.add_argument("--append", action="store_true",
                   help="incremental: skip urls already in the output "
                        "layout and add new shards instead of overwriting")
    p.add_argument("--compact", action="store_true",
                   help="after writing, rewrite the layout into "
                        "size-bounded files (small-file maintenance)")
    p.add_argument("--cpus", type=int, default=None)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    active = SparkSession.getActiveSession()
    if active is not None:
        spark = active
    else:
        from readur_spark.session import get_spark

        spark = get_spark(cpus=args.cpus)

    from readur_spark.ml.webfilters import (
        redact_pii,
        web_filter_signals,
        with_hash_split,
    )
    from readur_spark.operators.sinks import write_training_shards

    import os

    # accept either a snapshot-store root (manifest-addressed — only
    # PUBLISHED snapshots are visible) or a plain parquet path
    if os.path.isdir(os.path.join(args.input, "manifests")):
        from readur_spark.operators.checkpoint import SnapshotStore

        docs = SnapshotStore(args.input).read(spark)
        if docs is None:
            print(json.dumps({"status": "empty_store", "output": args.output}))
            return 0
    else:
        docs = spark.read.parquet(args.input)

    # 0. round-3 hygiene tier (all opt-in; each stage is a projection
    # or a slim broadcast/semi-join — see the ml modules' scale notes)
    if args.license_gate:
        # columns come from run_extraction --license-signals; a
        # pushed-down filter, first so nothing downstream pays for
        # pages the license posture already excludes
        missing = [
            c for c in ("license_id", "permissive") if c not in docs.columns
        ]
        if missing:
            print(json.dumps({
                "status": "error",
                "error": "--license-gate needs columns %s; re-run "
                         "extraction with --license-signals" % missing,
            }))
            return 2
        if args.license_gate == "permissive":
            docs = docs.filter(F.col("permissive"))
        else:
            docs = docs.filter(F.col("license_id").isNotNull())
    if args.url_gates:
        from readur_spark.ml.urlfilters import with_url_gates

        bl = None
        if args.domain_blocklist:
            bl = (
                spark.read.text(args.domain_blocklist)
                .select(F.trim(F.col("value")).alias("domain"))
                .filter(F.col("domain") != "")
            )
        gate_cols = [
            "host", "domain", "url_bad_host", "url_ip_host",
            "url_has_port", "url_too_long", "url_badword",
            "url_blocked_domain", "url_keep",
        ]
        docs = (
            with_url_gates(docs, bl, url_col=args.url_col)
            .filter(F.col("url_keep"))
            .drop(*gate_cols)
        )
    if args.domain_cap:
        from readur_spark.ml.urlfilters import domain_cap_sample

        docs = domain_cap_sample(
            docs, args.domain_cap,
            url_col=args.url_col, key_col=args.url_col,
        ).drop("domain", "domain_rank")
    if args.code_route or args.math_route:
        # content routing runs BEFORE any text-mutating or prose-gate
        # stage: the C4/line/LM tiers systematically delete code and
        # math (symbol ratios, terminal punctuation), so a code/math
        # corpus must fork off here; both signals are pure projections
        from readur_spark.ml.codemath import code_likeness, math_signals

        if args.code_route:
            flagged = code_likeness(docs, text_col=args.text_col)
            docs = flagged.filter(
                F.col("is_code") if args.code_route == "only"
                else ~F.col("is_code")
            ).drop("n_code_kw", "n_code_sym", "code_score_milli", "is_code")
        if args.math_route:
            from readur_spark.ml.codemath import MATH_SCORE_THRESHOLD_MILLI

            scored = math_signals(docs, text_col=args.text_col)
            is_math = (
                F.col("math_score_milli") >= MATH_SCORE_THRESHOLD_MILLI
            ) | F.col("has_mathml")
            docs = scored.filter(
                is_math if args.math_route == "only" else ~is_math
            ).drop(
                "n_display_eq", "n_inline_eq", "n_latex_envs",
                "has_mathml", "math_score_milli",
            )
    if args.mojibake:
        from readur_spark.ml.mojibake import repair_mojibake

        # encoding repair runs BEFORE normalization: NFC over garbled
        # bytes would bake the damage in
        docs = (
            repair_mojibake(docs, text_col=args.text_col, out_col="__fixed")
            .withColumn(args.text_col, F.col("__fixed"))
            .drop("__fixed", "was_mojibake")
        )
    if args.nfc:
        from readur_spark.ml.normalize import (
            clean_whitespace,
            nfc_normalize_col,
        )

        docs = docs.withColumn(
            args.text_col,
            clean_whitespace(nfc_normalize_col(F.col(args.text_col))),
        )
    if args.line_filter:
        from readur_spark.ml.linefilters import c4_line_filter

        docs = (
            c4_line_filter(docs, text_col=args.text_col, out_col="__clean")
            .withColumn(args.text_col, F.col("__clean"))
            .drop("__clean", "n_lines", "n_lines_kept")
        )
    if args.paragraph_dedup:
        from readur_spark.ml.paradedup import paragraph_dedup_keep_first

        docs = (
            paragraph_dedup_keep_first(
                docs, text_col=args.text_col,
                id_col=args.url_col, out_col="__para",
            )
            .withColumn(args.text_col, F.col("__para"))
            .drop("__para", "n_paras", "n_paras_kept")
        )
    if args.sentence_dedup:
        from readur_spark.ml.sentdedup import sentence_dedup

        # below-paragraph granularity: syndicated single sentences
        # inside otherwise-unique paragraphs (runs after the paragraph
        # pass so whole-paragraph duplicates are already gone)
        docs = (
            sentence_dedup(
                docs, text_col=args.text_col,
                id_col=args.url_col, out_col="__sent",
            )
            .withColumn(args.text_col, F.col("__sent"))
            .drop("__sent", "n_sents", "n_sents_kept")
        )
    if args.blocklist:
        from readur_spark.ml.blocklist import banned_term_hits

        with open(args.blocklist, encoding="utf-8") as fh:
            terms = [
                (ln.strip().lower(),) for ln in fh if ln.strip()
            ]
        terms_df = docs.sparkSession.createDataFrame(
            terms, "term string"
        )
        hit_ids = (
            banned_term_hits(
                docs, terms_df,
                text_col=args.text_col, id_col=args.url_col,
            )
            .filter(F.col("n_banned_hits") > 0)
            .select(args.url_col)
        )
        docs = docs.join(hit_ids, args.url_col, "left_anti")
    if args.lm_filter:
        from readur_spark.ml.quality_lm import score_unigram_surprisal

        # Anti-join the ids scored 'tail' rather than semi-joining the
        # kept ids: documents with zero alphabetic tokens never get a
        # score row, and the min-words document gate — not this flag —
        # owns that decision (ADVICE r3).
        tail_ids = score_unigram_surprisal(
            docs, text_col=args.text_col, id_col=args.url_col
        ).filter(F.col("ppl_bucket") == "tail").select(args.url_col)
        docs = docs.join(tail_ids, args.url_col, "left_anti")
    if args.nb_filter:
        from readur_spark.ml.quality_classifier import (
            score_nb,
            train_nb_llr,
        )
        from readur_spark.ml.quality_lm import tokenize_alpha
        from readur_spark.ml.webfilters import web_filter_signals as _wfs

        # weak labels from the same document gates the job enforces
        # later; anti-join the ids scored NEGATIVE (same unscored-doc
        # ownership rule as --lm-filter above)
        _sig = _wfs(F.col(args.text_col), min_words=args.min_words)
        _lab = docs.select(
            F.col(args.url_col), F.col(args.text_col),
            _sig["keep"].cast("int").alias("label"),
        )
        _toks = _lab.select(
            "label",
            F.explode(tokenize_alpha(F.col(args.text_col))).alias("token"),
        )
        _model, _prior = train_nb_llr(_toks)
        neg_ids = score_nb(
            _lab, _model, _prior,
            text_col=args.text_col, id_col=args.url_col,
        ).filter(F.col("predicted") == 0).select(args.url_col)
        docs = docs.join(neg_ids, args.url_col, "left_anti")

    if args.soft_dedup_cap:
        from readur_spark.ml.softdedup import soft_dedup_weights

        # anti-join the ids whose gram commonness exceeds the cap —
        # heavily-syndicated content leaves, the long tail of partial
        # duplication stays (the soft alternative to exact dedup's
        # keep-one; the exact-dedup winner election below still runs)
        heavy_ids = (
            soft_dedup_weights(
                docs, id_col=args.url_col, text_col=args.text_col
            )
            .filter(F.col("commonness_mfp") > args.soft_dedup_cap)
            .select(F.col("doc_id").alias(args.url_col))
        )
        docs = docs.join(heavy_ids, args.url_col, "left_anti")

    text = F.col(args.text_col)

    # 1. document gates
    sig = web_filter_signals(text, min_words=args.min_words)
    gated = docs.filter(text.isNotNull()).select(
        F.col(args.url_col).alias("url"),
        text.alias("text"),
        F.sha2(text, 256).alias("sha256"),
        sig["n_words"].alias("n_words"),
        sig["keep"].alias("keep"),
    ).filter(F.col("keep") == 1)

    # 2. exact dedup winners: min url per content hash (slim agg, the
    # same winner rule as the ingest dedup subtree)
    mirror_pairs = None
    if args.mirror_report:
        from readur_spark.ml.mirrors import host_mirror_pairs
        from readur_spark.ml.urlfilters import url_host

        shaped = gated.select(
            url_host(F.col("url")).alias("source"), F.col("text")
        )
        mirror_pairs = [
            {"host_a": r["host_a"], "host_b": r["host_b"],
             "shared": r["shared"],
             "mirror_permille": r["mirror_permille"],
             "is_mirror": r["is_mirror"]}
            for r in host_mirror_pairs(shaped)
            .orderBy(F.desc("mirror_permille"), "host_a", "host_b")
            .limit(50).collect()
        ]
    winners = gated.groupBy("sha256").agg(F.min("url").alias("url"))
    deduped = gated.join(winners, ["sha256", "url"], "left_semi")

    # 3. optional PII scrub
    out = deduped
    if args.redact_pii:
        out = out.withColumn("text", redact_pii(F.col("text")))
    n_secret_docs = None
    if args.secrets_gate:
        # drop docs with ≥1 flagged high-entropy candidate: the scan
        # emits a slim (url, n_flagged) frame; the gate is a left-anti
        # join on it — the payload is never shuffled
        from readur_spark.ml.secrets import secrets_report

        flagged_docs = (
            secrets_report(out, text_col="text", id_col="url")
            .filter(F.col("n_flagged") > 0)
            .select("url")
        )
        n_secret_docs = flagged_docs.count()
        out = out.join(flagged_docs, "url", "left_anti")

    # 4. deterministic split
    split = with_hash_split(out, "url").select(
        "url", "text", "n_words", "split"
    )
    appending = args.append and os.path.isdir(args.output)
    if appending:
        # incremental ingest: anti-join against the urls already
        # shipped (slim column read of the existing layout — at scale
        # this is the url-only projection of a partition-pruned scan)
        from readur_spark.operators.sinks import read_training_shards

        existing = read_training_shards(spark, args.output, args.fmt).select("url")
        split = split.join(existing, "url", "left_anti")

    # 5. materialize ONCE, then write. The gates + dedup semi-join
    # (+ PII regex pass + append anti-join) execute a single time: the
    # yields summary forces the persisted plan BEFORE any write mutates
    # the output directory the append anti-join reads, and the shard
    # write consumes the cached rows. (Previously the summary ran after
    # the write and re-executed the whole plan — doubling the job at
    # scale and, in append mode, silently depending on Spark's one-time
    # file-index listing not being refreshed.) The Observation reports
    # how many rows crossed the pipeline exactly once — the test pins
    # observed == rows written.
    from pyspark import StorageLevel
    from pyspark.sql import Observation

    obs = Observation("curation_rows")
    split = split.observe(obs, F.count(F.lit(1)).alias("n_rows"))
    split = split.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        yields = {
            r["split"]: {"n_docs": r["n_docs"], "total_words": r["total_words"]}
            for r in split.groupBy("split").agg(
                F.count("*").alias("n_docs"),
                F.sum("n_words").cast("long").alias("total_words"),
            ).collect()
        }
        if appending and not yields:
            # (don't touch obs here: AQE prunes a provably-empty plan
            # to a local relation and the metrics row never material-
            # izes — and 0 rows shipped needs no accounting anyway)
            print(json.dumps({"status": "up_to_date", "output": args.output}))
            return 0
        # snapshot now: an Observation is single-action — reading it
        # after the write (a second action over the cached plan) fails.
        # Zero-row plans produce an EMPTY metrics row (the aggregation
        # short-circuits), so only read it when rows actually flowed.
        rows_observed = int(obs.get["n_rows"]) if yields else 0
        leakage = None
        if args.leakage_audit:
            from readur_spark.ml.leakage import split_leakage_report

            # runs on the persisted split frame (labels from
            # with_hash_split: train/valid/test — the report audits
            # every non-train split against train)
            leakage = {
                r["split"]: {
                    "n_docs": r["n_docs"],
                    "n_leaked_docs": r["n_leaked_docs"],
                    "leaked_permille": r["leaked_permille"],
                }
                for r in split_leakage_report(
                    split, id_col="url", split_col="split"
                ).collect()
            }
        doremi_domains = None
        if args.doremi_report:
            from readur_spark.ml.doremi import doremi_plan
            from readur_spark.ml.urlfilters import url_host

            # domain = url host of the curated docs; the plan runs on
            # the post-gate corpus so quotas reflect what a training
            # run would actually sample from
            shaped = split.select(
                F.col("url").alias("doc_id"),
                F.col("text"),
                url_host(F.col("url")).alias("source"),
            )
            plan = doremi_plan(shaped, budget=args.doremi_budget)
            plan.write.mode("overwrite").parquet(args.doremi_report)
            doremi_domains = plan.count()
        unimax_langs = None
        if args.unimax_report:
            if args.lang_col not in split.columns and \
                    args.lang_col not in docs.columns:
                print(json.dumps({
                    "status": "error",
                    "error": "--unimax-report needs a '%s' column on "
                             "the input (see --lang-col)" % args.lang_col,
                }))
                return 2
            from pyspark.sql import functions as _F

            from readur_spark.ml.mixing import plan_unimax

            if args.lang_col in split.columns:
                shaped = split.select(
                    _F.col(args.lang_col).alias("lang"), "text")
            else:
                # lang lives on the raw input: re-join it by url
                shaped = split.join(
                    docs.select("url", _F.col(args.lang_col).alias("lang")),
                    "url",
                ).select("lang", "text")
            budget = (
                _F.lit(args.unimax_budget).cast("long")
                if args.unimax_budget is not None else None
            )
            uplan = plan_unimax(shaped, budget=budget)
            uplan.write.mode("overwrite").parquet(args.unimax_report)
            unimax_langs = uplan.count()
        write_training_shards(
            split, args.output,
            partition_cols=["split"], id_col="url",
            max_records_per_file=args.max_records_per_file, fmt=args.fmt,
            mode="append" if appending else "overwrite",
        )
        if args.compact:
            from readur_spark.operators.sinks import compact_shards

            compact_shards(
                spark, args.output, partition_cols=["split"], id_col="url",
                max_records_per_file=args.max_records_per_file, fmt=args.fmt,
            )
        summary = {
            "status": "written",
            "output": args.output,
            "yields": yields,
            "rows_observed": rows_observed,
        }
        if leakage is not None:
            summary["leakage"] = leakage
        if doremi_domains is not None:
            summary["doremi_report"] = args.doremi_report
            summary["doremi_domains"] = doremi_domains
        if n_secret_docs is not None:
            summary["secrets_dropped"] = n_secret_docs
        if mirror_pairs is not None:
            summary["mirror_pairs"] = mirror_pairs
        if args.datasheet:
            from readur_spark.ml.datasheet import corpus_datasheet
            from readur_spark.ml.urlfilters import url_host

            card_in = split.select(
                F.col("text"),
                F.lit("und").alias("lang"),
                url_host(F.col("url")).alias("source"),
            )
            [card] = corpus_datasheet(card_in).collect()
            summary["datasheet"] = {k: card[k] for k in card.asDict()}
        if unimax_langs is not None:
            summary["unimax_report"] = args.unimax_report
            summary["unimax_langs"] = unimax_langs
        print(json.dumps(summary))
        return 0
    finally:
        split.unpersist()


if __name__ == "__main__":
    sys.exit(main())
