"""Scale-stress the sketch/dedup/ANN family: inflate documents+embeddings
N-fold (default 10x sf0.1), run the heavy registry queries at 1x and Nx,
and report the wall-clock growth factor per query.

The LSH operators are parameterized to stay sub-quadratic
(planes_for_corpus / minhash_bands_for_corpus / MAX_BUCKET_ROWS): a growth
factor well below N^2 — ideally ~N — is the pass condition. At 10x docs
(50k) the plane count leaves its floor (9 planes at 20k vectors), so the
adaptive path itself is exercised, not just measured.

Usage: python tools/scale_stress.py [factor] [base_sf_dir] [--out FILE]
Writes one JSON line: {"factor": N, "queries": {name: {"t1": s, "tN": s,
"growth": x}}, "flagged": {...}, "documented_exceptions": {...}} — and,
with --out, the same record to FILE (the STRESS_r{N}.json artifact the
judge diffs round over round, r7 verdict task #4).

Gate: any op whose growth exceeds GROWTH_GATE x the data factor and is
NOT in DOCUMENTED_SUPERLINEAR lands in "flagged" and the process exits
nonzero — super-linear growth in a new operator fails the harness the
way bench regressions fail the bench, instead of hiding in prose.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "t_exact_dedup",
    "t_ngram_jaccard",
    "s_minhash_lsh_pairs",
    "s_simhash_candidates",
    "s_ann_lsh_topk",
    "s_embedding_neardup",
    "t_langid_quality",
    # round-4 stage-2 pipeline ops
    "d_dedup_components",
    "t_contamination",
    "t_pii_scan",
    "t_sample_stratified",
    # round-5 graduates
    "t_repetition",
    "s_quantize_int8",
    # p_chunk_documents merged into p_pack_sequences' 'chunk' branch (r7)
    "p_pack_sequences",
    # round-6 graduates
    "t_clean_lines",
    "t_vocab_unigram",
    # round-7 graduate (one corpus word count + driver-side training —
    # growth well under N; q_pagerank instead gets a custom runner with
    # an edge list that actually scales, since only documents/embeddings
    # inflate)
    "q_bpe_train",
    # round-8 graduate: featurize (one explode + one agg) + one
    # aggregate per epoch + scoring projection — growth ~N
    # (q_stream_sync_endstate reads orders, which the inflater symlinks
    # unscaled, so it has no meaningful growth to measure here)
    # r9: also carries the DoReMi branches (one more corpus aggregate)
    "q_quality_classifier",
    # round-9 graduate: BM25 + RRF + hard-negative mining — postings
    # build is the dominant corpus-linear term; mining adds one
    # broadcast anti-join over retrieved lists only
    "q_bm25_search",
]


# growth above GROWTH_GATE x the data factor fails the harness unless
# the op is documented here (reason strings match COVERAGE.md prose)
GROWTH_GATE = 1.5
DOCUMENTED_SUPERLINEAR = {
    "t_ngram_jaccard": (
        "capped blocked verify: replicas saturate the per-block pair "
        "budget; cap bites by design (COVERAGE.md, documented since r5)"
    ),
    "t_contamination": (
        "SEMANTIC pair blow-up, root-caused r12 (the r11 verdict's task "
        "#3): the query's countDistinct(eval_doc) metric must "
        "materialize every distinct (train_doc, eval_doc) matching "
        "pair, and under the replica generator that pair SET itself "
        "grows ~N^2 (each of the N train replicas of a doc shares "
        "shingles with each of the N eval replicas of its match) — "
        "irreducible input/output blow-up, not a join-shape defect. "
        "Mechanical proof: the companion row "
        "t_contamination_shingles_only runs the SAME shingle join with "
        "the pair metric dropped (n_shared_shingles only, joined "
        "against DISTINCT eval hashes) and grows ~N. See COVERAGE.md."
    ),
    "semdedup_exact": (
        "brute-force centroid ASSIGNMENT is n x k dot products with "
        "k ~ n/64 — kept as the documented baseline-exception row; the "
        "default `semdedup` row runs the hierarchical (two-level probe) "
        "assignment, the production shape (r10)"
    ),
}


def inflate(base: str, out_dir: str, factor: int) -> None:
    """Replicate documents/embeddings factor-fold with perturbed copies:
    copy k of doc i keeps the text/vector close-but-not-identical (suffix
    token / +k on one dimension), so near-dup structure stays realistic
    instead of forcing every replica into one hot bucket."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    docs = pq.read_table(os.path.join(base, "documents.parquet"))
    n = docs.num_rows
    cols = {c: docs[c].to_pylist() for c in docs.column_names}
    out = {c: [] for c in docs.column_names}
    for k in range(factor):
        for i in range(n):
            for c in docs.column_names:
                if c == "doc_id":
                    out[c].append(cols[c][i] + k * 10_000_000)
                elif c == "text" and k:
                    out[c].append(f"{cols[c][i]} rep{k}")
                else:
                    out[c].append(cols[c][i])
    # bounded row groups (r13): a single-row-group parquet is
    # UNSPLITTABLE — every Spark scan of it is one task regardless of
    # maxPartitionBytes, which serialized the whole 100x PQ/kmeans fit
    # through one core (the r12 straggler). Real 100 TB corpora arrive
    # as many files/row groups; the stress data should too.
    pq.write_table(
        pa.table(out, schema=docs.schema),
        os.path.join(out_dir, "documents.parquet"),
        row_group_size=10_000,
    )

    emb = pq.read_table(os.path.join(base, "embeddings.parquet"))
    vec_ids = np.asarray(emb["vec_id"].to_pylist())
    X = np.stack(emb["embedding"].to_pylist()).astype(np.float32)
    labels = np.asarray(emb["label"].to_pylist())
    m = len(vec_ids)
    all_ids, all_X, all_labels = [], [], []
    for k in range(factor):
        Xk = X.copy()
        if k:
            Xk[:, k % X.shape[1]] += 0.01 * k  # nudge, stays near original
        all_ids.append(vec_ids + k * 10_000_000)
        all_X.append(Xk)
        all_labels.append(labels)
    pq.write_table(
        pa.table(
            {
                "vec_id": np.concatenate(all_ids),
                "embedding": pa.array(
                    [list(map(float, r)) for r in np.vstack(all_X)],
                    pa.list_(pa.float32()),
                ),
                "label": np.concatenate(all_labels),
            }
        ),
        os.path.join(out_dir, "embeddings.parquet"),
        row_group_size=10_000,
    )
    print(f"inflated {n} docs/{m} vecs -> {n * factor}/{m * factor}", file=sys.stderr)


def link_base_tables(base: str, out_dir: str) -> None:
    """Symlink the non-inflated tables (TPC-H relations, events) into the
    inflated dir so any registry query can run there; only documents and
    embeddings scale with the factor."""
    for f in os.listdir(base):
        if not f.endswith(".parquet"):
            continue
        if f.split(".")[0] in ("documents", "embeddings"):
            continue
        dst = os.path.join(out_dir, f)
        if not os.path.exists(dst):
            os.symlink(os.path.join(base, f), dst)


def main() -> None:
    args = list(sys.argv[1:])
    out_path = None
    if "--out" in args:
        i = args.index("--out")
        if i + 1 >= len(args):
            raise SystemExit("usage: scale_stress.py [N] [BASE] --out FILE")
        out_path = args[i + 1]
        del args[i : i + 2]
    only: set[str] | None = None
    if "--only" in args:
        # r11 (verdict #6): run a named subset at a deeper factor (e.g.
        # the serving/dedup rows at 30x) without paying the full matrix
        i = args.index("--only")
        if i + 1 >= len(args):
            raise SystemExit("usage: scale_stress.py [N] [BASE] --only a,b,c")
        only = {x.strip() for x in args[i + 1].split(",") if x.strip()}
        del args[i : i + 2]
    factor = int(args[0]) if len(args) > 0 else 10
    base = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    out_dir = f"/tmp/seafowl_spark_scale_{factor}x"
    if not os.path.exists(os.path.join(out_dir, "embeddings.parquet")):
        inflate(base, out_dir, factor)
    link_base_tables(base, out_dir)

    from seafowl_spark.queries import load_all
    from seafowl_spark.session import build_session

    import tempfile as _tf

    # event log on (r13): per-TASK durations for the build-phase
    # straggler gate — the Python StatusTracker exposes no task times,
    # but the event log records every SparkListenerTaskEnd. Stage-end
    # events flush the log, and we only read windows whose jobs have
    # finished, so buffering cannot hide the tasks we care about.
    evlog_dir = _tf.mkdtemp(prefix="sfs_evlog_")
    spark = build_session(
        "seafowl_spark_scale_stress",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evlog_dir,
            "spark.eventLog.compress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    def _task_stats(t0_ms: int, t1_ms: int) -> dict:
        """Per-stage task-duration stats for tasks finishing in the
        window: the straggler evidence (r12 verdict task #4). Reports
        the worst max/median ratio among stages with >= 2 tasks and a
        max task >= 1 s (trivial stages prove nothing), the single
        longest task anywhere, and the longest SINGLE-task stage — the
        r12 straggler was exactly that shape: one 20-minute task in a
        parallelism-collapsed fit stage."""
        import glob as _glob
        import re as _re
        import statistics

        # the event-log listener is ASYNC: let the bus drain and the
        # writer flush before reading, or the window's tail tasks are
        # still in the buffer (observed: the last job's stage missing)
        time.sleep(2.0)

        # cheap pre-parse window filter: the log holds the WHOLE run's
        # TaskEnds and both window calls happen after the run, so most
        # matching lines are out-of-window — extract Finish Time with a
        # regex before paying json.loads (offset tracking would be
        # wrong here: call 1 reads past call 2's events)
        ft_re = _re.compile(r'"Finish Time":\s*(\d+)')

        by_stage: dict[tuple, list[float]] = {}
        # Spark 4 writes a rolling event-log DIRECTORY (eventlog_v2_*/
        # events_*) — walk files, skip the appstatus marker
        paths = [
            p
            for p in _glob.glob(os.path.join(evlog_dir, "**"), recursive=True)
            if os.path.isfile(p) and "appstatus" not in os.path.basename(p)
        ]
        for path in paths:
            with open(path, errors="replace") as f:
                for line in f:
                    if '"SparkListenerTaskEnd"' not in line:
                        continue
                    m = ft_re.search(line)
                    if m and not (t0_ms <= int(m.group(1)) <= t1_ms):
                        continue
                    try:
                        ev = json.loads(line)
                    except json.JSONDecodeError:
                        continue  # torn tail line of an in-progress log
                    info = ev.get("Task Info") or {}
                    fin = info.get("Finish Time") or 0
                    if not (t0_ms <= fin <= t1_ms):
                        continue
                    dur = (fin - (info.get("Launch Time") or fin)) / 1000.0
                    key = (ev.get("Stage ID"), ev.get("Stage Attempt ID"))
                    by_stage.setdefault(key, []).append(dur)
        worst_ratio, worst_stage = 0.0, None
        longest_task = 0.0
        longest_single = 0.0
        ntasks = 0
        for key, durs in by_stage.items():
            ntasks += len(durs)
            longest_task = max(longest_task, max(durs))
            if len(durs) == 1:
                longest_single = max(longest_single, durs[0])
                continue
            mx, med = max(durs), statistics.median(durs)
            if mx >= 1.0 and med > 0 and mx / med > worst_ratio:
                worst_ratio, worst_stage = mx / med, {
                    "stage": key[0], "tasks": len(durs),
                    "max_sec": round(mx, 2), "median_sec": round(med, 2),
                }
        return {
            "tasks": ntasks,
            "stages": len(by_stage),
            "longest_task_sec": round(longest_task, 2),
            "longest_single_task_stage_sec": round(longest_single, 2),
            "worst_max_over_median": round(worst_ratio, 2),
            "worst_stage": worst_stage,
        }

    build_task_stats: dict[str, dict] = {}
    regs = load_all()

    def run(name: str, sf_dir: str) -> float:
        t0 = time.perf_counter()
        regs[name].fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        return round(time.perf_counter() - t0, 2)

    # warm-up: JVM + python workers
    run("t_exact_dedup", base)
    out: dict[str, dict] = {}
    for name in QUERIES:
        if only is not None and name not in only:
            continue
        t1 = run(name, base)
        tn = run(name, out_dir)
        out[name] = {"t1": t1, "tN": tn, "growth": round(tn / max(t1, 1e-9), 1)}
        print(json.dumps({name: out[name]}), file=sys.stderr)

    def zorder_rewrite(sf_dir: str) -> float:
        """OPTIMIZE ... ZORDER BY wall time: one range shuffle over the
        table, so growth should track N (the rewrite is data-linear)."""
        import shutil
        import tempfile

        from pyspark.sql import types as T

        from seafowl_spark.engine.deltalite import DeltaLiteTable

        d = tempfile.mkdtemp(prefix="sfs_zstress_")
        shutil.rmtree(d, ignore_errors=True)
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
            "doc_id", "n_chars", "lang"
        )
        t = DeltaLiteTable.create(
            spark, d, T.StructType.fromDDL("doc_id bigint, n_chars bigint, lang string")
        )
        t.append(docs)
        t0 = time.perf_counter()
        t.optimize(target_rows=5000, zorder_by=["n_chars", "doc_id"])
        dt = round(time.perf_counter() - t0, 2)
        shutil.rmtree(d, ignore_errors=True)
        return dt

    if only is None or "zorder_optimize" in only:
        t1 = zorder_rewrite(base)
        tn = zorder_rewrite(out_dir)
        out["zorder_optimize"] = {"t1": t1, "tN": tn, "growth": round(tn / max(t1, 1e-9), 1)}
        print(json.dumps({"zorder_optimize": out["zorder_optimize"]}), file=sys.stderr)

    # ---- r6 non-registry operators: custom runners, growth should be ~N
    from pyspark.sql import functions as F

    def bm25_stress(sf_dir: str) -> float:
        """Query-batch retrieval: corpus-linear postings projection, the
        rest broadcast/pruned — growth ~N."""
        from seafowl_spark.operators.bm25 import bm25_topk

        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
            "doc_id", "text"
        )
        queries = spark.createDataFrame(
            [(1, "spark merge join window"), (2, "batch stream filter"),
             (3, "table scan vector")],
            ["query_id", "query_text"],
        )
        t0 = time.perf_counter()
        bm25_topk(docs, queries, k=10).write.mode("overwrite").format("noop").save()
        return round(time.perf_counter() - t0, 2)

    def ivf_pq_stress(sf_dir: str) -> float:
        """Encode + cell-bucketed ADC with FIXED synthetic codebooks (so
        both sizes run identical models): corpus-linear encode, candidate
        work bounded by probed cells — growth ~N."""
        from seafowl_spark.operators.pq import ivf_pq_topk

        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
            "vec_id", F.col("embedding").cast("array<double>").alias("emb")
        )
        dim, m, ksub, ncell = 64, 8, 16, 8
        books = [
            [[0.1 * ((j + c + d) % 7 - 3) for d in range(dim // m)] for c in range(ksub)]
            for j in range(m)
        ]
        cents = [
            [0.05 * ((c + d) % 9 - 4) for d in range(dim)] for c in range(ncell)
        ]
        queries = emb.where(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "emb"
        )
        t0 = time.perf_counter()
        ivf_pq_topk(emb, queries, cents, books, k=10, nprobe=4).write.mode(
            "overwrite"
        ).format("noop").save()
        return round(time.perf_counter() - t0, 2)

    def nb_stress(sf_dir: str) -> float:
        """Train on lang labels + score the corpus: two corpus-linear
        passes with broadcast model joins — growth ~N."""
        from seafowl_spark.operators.classifier import fit_nb, nb_predict

        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
            "doc_id", "text", F.col("lang").alias("label")
        )
        t0 = time.perf_counter()
        model = fit_nb(docs, vocab_size=256)
        nb_predict(docs.select("doc_id", "text"), model).write.mode(
            "overwrite"
        ).format("noop").save()
        return round(time.perf_counter() - t0, 2)

    def bpe_stress(sf_dir: str) -> float:
        """5 merge rounds: ONE corpus-sized word count, then rounds over
        the vocab-bounded word table — growth should sit well UNDER N
        (the synthetic corpus's distinct-word set barely grows with
        replication)."""
        from seafowl_spark.operators.bpe import learn_bpe

        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
            "doc_id", "text"
        )
        t0 = time.perf_counter()
        learn_bpe(docs, n_merges=5)
        return round(time.perf_counter() - t0, 2)

    def substring_stress(sf_dir: str) -> float:
        """Repeated-span removal: row-local span hashing + one linear
        (hash, doc, pos) shuffle — growth ~N (the replica generator
        guarantees plenty of cross-doc repeats at Nx)."""
        from seafowl_spark.operators.substring_dedup import remove_repeated_spans

        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
            "doc_id", "text"
        )
        t0 = time.perf_counter()
        remove_repeated_spans(docs, span_tokens=20).write.mode(
            "overwrite"
        ).format("noop").save()
        return round(time.perf_counter() - t0, 2)

    def mixture_stress(sf_dir: str) -> float:
        """One bounded per-category aggregate + a pure filter: growth ~N
        at scan cost."""
        from seafowl_spark.operators.mixture import mixture_sample

        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
            "doc_id", "lang"
        )
        t0 = time.perf_counter()
        mixture_sample(docs, {"en": 0.5, "de": 0.25, "es": 0.25}).write.mode(
            "overwrite"
        ).format("noop").save()
        return round(time.perf_counter() - t0, 2)

    def serving_stress(sf_dir: str) -> float:
        """Persisted-index SERVING only (index build excluded): both
        scans prune to probed partitions, so growth should sit well
        UNDER N even though the corpus is Nx."""
        from seafowl_spark.operators.bm25 import bm25_topk_indexed, write_bm25_index
        from seafowl_spark.operators.kmeans import fit_kmeans
        from seafowl_spark.operators.pq import (
            fit_pq_residual,
            ivf_pq_topk_indexed,
            normalized,
            write_ivfpq_index,
        )
        import shutil
        import tempfile

        d = tempfile.mkdtemp(prefix="sfs_serve_stress_")
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
            "doc_id", "text"
        )
        write_bm25_index(docs, f"{d}/bm25", n_buckets=64)
        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
            "vec_id", F.col("embedding").cast("array<double>").alias("emb")
        )
        cn = normalized(emb)
        cents = fit_kmeans(cn.sample(0.2, seed=7), k=8, max_iter=2)
        books = fit_pq_residual(cn.sample(0.2, seed=7), cents, m=8, ksub=16, max_iter=1)
        write_ivfpq_index(emb, f"{d}/ivfpq", cents, books)
        bq = spark.createDataFrame(
            [(1, "spark merge join window"), (2, "batch stream filter")],
            ["query_id", "query_text"],
        )
        vq = emb.where(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "emb"
        )
        t0 = time.perf_counter()
        bm25_topk_indexed(spark, f"{d}/bm25", bq, k=10).write.mode(
            "overwrite"
        ).format("noop").save()
        ivf_pq_topk_indexed(spark, f"{d}/ivfpq", vq, k=10, nprobe=2).write.mode(
            "overwrite"
        ).format("noop").save()
        dt = round(time.perf_counter() - t0, 2)
        shutil.rmtree(d, ignore_errors=True)
        return dt

    def pagerank_stress(sf_dir: str) -> float:
        """3 rounds over a synthetic edge list sized to the corpus
        (the registry row's nation graph is fixed-size, so it cannot
        measure scaling): per round one src-keyed join + one dst
        aggregate — growth ~N."""
        from seafowl_spark.operators.graph import pagerank

        n_docs = spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        ).count()
        n_edges, n_verts = n_docs * 8, max(n_docs // 4, 8)
        edges = spark.range(n_edges).select(
            (F.col("id") % n_verts).alias("src"),
            ((F.col("id") * 7 + 3) % n_verts).alias("dst"),
        )
        t0 = time.perf_counter()
        pagerank(edges, max_iter=3, tol=0.0).write.mode("overwrite").format(
            "noop"
        ).save()
        return round(time.perf_counter() - t0, 2)

    def contamination_shingles_only_stress(sf_dir: str) -> float:
        """t_contamination's join with the pair-quadratic metric
        DROPPED (r12 root-cause proof, the r11 verdict's task #3): the
        train side joins DISTINCT eval shingle hashes, so the
        intermediate is at most |train shingles| — one row per (doc, h)
        regardless of how many eval docs share h. If THIS row grows ~N
        while t_contamination grows ~N^2-ish, the blow-up is the
        countDistinct(eval_doc) pair semantics, not the join shape."""
        from seafowl_spark.functions import md5_int
        from seafowl_spark.queries.pipeline import _EVAL_MOD
        from seafowl_spark.queries.similarity import _h8, _shingled_docs

        sh = (
            _shingled_docs(spark, sf_dir)
            .withColumn(
                "is_eval",
                md5_int(F.col("doc_id").cast("string")) % _EVAL_MOD == 0,
            )
            .persist()
        )
        ev_h = (
            sh.where(F.col("is_eval"))
            .select(F.explode("shingles").alias("s"))
            .select(_h8(F.col("s")).alias("h"))
            .distinct()
        )
        tr = (
            sh.where(~F.col("is_eval"))
            .select("doc_id", F.explode("shingles").alias("s"))
            .select("doc_id", _h8(F.col("s")).alias("h"))
        )
        t0 = time.perf_counter()
        (
            tr.join(F.broadcast(ev_h), "h")
            .groupBy("doc_id")
            .agg(F.countDistinct("h").alias("n_shared_shingles"))
            .write.mode("overwrite")
            .format("noop")
            .save()
        )
        dt = round(time.perf_counter() - t0, 2)
        sh.unpersist()
        return dt

    def contamination_bounded_stress(sf_dir: str) -> float:
        """The r12 verdict's task #5: t_contamination's SAME split and
        shingle hashing, but counted through
        operators/cross_contamination.contamination_counts_bounded —
        the eval side pre-aggregates per-h HLL sketches (one row per
        distinct h), the join output is |distinct train (doc,h)|, and
        per-doc eval counts come from sketch union. NOTHING in the plan
        is pair-shaped, so where the graded pair mode grows ~N^2 under
        the replica generator this row must grow ~N — the bounded
        reporting mode for corpora whose hot eval docs would OOM the
        exact distinct."""
        from seafowl_spark.functions import md5_int
        from seafowl_spark.operators.cross_contamination import (
            contamination_counts_bounded,
        )
        from seafowl_spark.queries.pipeline import _EVAL_MOD
        from seafowl_spark.queries.similarity import _h8, _shingled_docs

        sh = (
            _shingled_docs(spark, sf_dir)
            .withColumn(
                "is_eval",
                md5_int(F.col("doc_id").cast("string")) % _EVAL_MOD == 0,
            )
            .persist()
        )
        ev = (
            sh.where(F.col("is_eval"))
            .select(
                F.col("doc_id").alias("eval_doc"),
                F.explode("shingles").alias("s"),
            )
            .select("eval_doc", _h8(F.col("s")).alias("h"))
        )
        tr = (
            sh.where(~F.col("is_eval"))
            .select("doc_id", F.explode("shingles").alias("s"))
            .select("doc_id", _h8(F.col("s")).alias("h"))
        )
        t0 = time.perf_counter()
        contamination_counts_bounded(tr, ev).write.mode(
            "overwrite"
        ).format("noop").save()
        dt = round(time.perf_counter() - t0, 2)
        sh.unpersist()
        return dt

    def _semdedup_timed(sf_dir: str, assign_mode: str) -> float:
        """k scales WITH the corpus (clusters stay ~64 rows) so the
        within-cluster pairwise verify stays constant-per-cluster; the
        two rows differ only in ASSIGNMENT:

        * ``hierarchical`` (the DEFAULT `semdedup` row since r10): the
          two-level probe costs O(nprobe * sqrt(k)) scores per row — the
          production shape when k grows with the corpus.
        * ``exact`` (`semdedup_exact`, documented exception row): the
          brute-force n x k argmin is ~N^2 total work with k ~ n/64 —
          measured 3.7x-11.4x at 10x across r7-r9, parallelism-noisy.

        r11 generator fix: the previous grid ``0.05*((c+d)%9-4)``
        collapsed to NINE distinct centroid vectors (the pattern is
        periodic in c), so clusters silently grew as n/9 instead of the
        documented ~64 rows and the capped pairwise verify — 32M pairs
        at 10x vs 0.4M at 1x — was what the row actually measured (the
        r10 9.3x). The sin-phase grid below makes every centroid
        distinct, restoring the scenario this runner documents; the cap
        still bounds any genuinely hot cluster."""
        import math

        from seafowl_spark.operators.semdedup import semdedup

        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
            "vec_id", F.col("embedding").cast("array<double>").alias("emb")
        )
        n = emb.count()
        dim, ncell = 64, max(8, n // 64)
        cents = [
            [math.sin(c * 0.7 + d * 0.35) * 0.3 for d in range(dim)]
            for c in range(ncell)
        ]
        t0 = time.perf_counter()
        semdedup(
            emb,
            centroids=cents,
            threshold=0.3,
            assign_mode=assign_mode,
            # production shape at scale: the assignment subtree feeds
            # three consumers (both self-join sides + the final output);
            # persisting it is the stage-boundary discipline the e2e
            # pipeline already uses — without it the normalize+assign
            # math re-runs 3x over the corpus
            persist_assignments=True,
        ).write.mode("overwrite").format("noop").save()
        return round(time.perf_counter() - t0, 2)

    def semdedup_stress(sf_dir: str) -> float:
        return _semdedup_timed(sf_dir, "hierarchical")

    def semdedup_exact_stress(sf_dir: str) -> float:
        return _semdedup_timed(sf_dir, "exact")

    def lsh_lookup_stress(sf_dir: str) -> float:
        """Persisted LSH dedup index: LOOKUP only (build excluded, it is
        data-linear by construction). The probe reads only the buckets
        the new batch's band keys hash into, so growth should be ~flat
        (measured 0.94x at 10x when first added, r7 session B)."""
        import shutil
        import tempfile

        from seafowl_spark.operators.lsh_index import (
            neardup_lookup,
            write_lsh_index,
        )

        d = tempfile.mkdtemp(prefix="sfs_lsh_stress_")
        docs = spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        ).select("doc_id", "text")
        write_lsh_index(docs, d, n_buckets=64)
        new = spark.createDataFrame(
            [
                (900000001, "the quick brown fox jumps over the lazy dog"),
                (900000002, "spark adaptive query execution replans at runtime"),
            ],
            ["doc_id", "text"],
        )
        t0 = time.perf_counter()
        neardup_lookup(spark, d, new, threshold=0.3).write.mode(
            "overwrite"
        ).format("noop").save()
        dt = round(time.perf_counter() - t0, 2)
        shutil.rmtree(d, ignore_errors=True)
        return dt

    def index_builds_stress(sf_dir: str) -> float:
        """The BUILD phases the serving rows exclude, timed with
        per-task evidence (the r12 verdict's task #4): LSH dedup index
        build + IVF-PQ fit(sample)+encode+write. The r12 100x run
        showed a single 20-minute task in the PQ/kmeans fit — the fit
        sample inherited ONE parquet row group's worth of parallelism
        and fit_pq re-executed it per subspace. Fixed by bounded row
        groups in the inflater plus repartition+persist of the fit
        frame in fit_kmeans/fit_pq; this row keeps it fixed."""
        import shutil
        import tempfile

        from seafowl_spark.operators.kmeans import fit_kmeans
        from seafowl_spark.operators.lsh_index import write_lsh_index
        from seafowl_spark.operators.pq import (
            fit_pq_residual,
            normalized,
            write_ivfpq_index,
        )

        d = tempfile.mkdtemp(prefix="sfs_build_stress_")
        docs = spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        ).select("doc_id", "text")
        emb = spark.read.parquet(
            os.path.join(sf_dir, "embeddings.parquet")
        ).select(
            "vec_id", F.col("embedding").cast("array<double>").alias("emb")
        )
        label = "1x" if sf_dir == base else f"{factor}x"
        w0 = int(time.time() * 1000)
        t0 = time.perf_counter()
        write_lsh_index(docs, f"{d}/lsh", n_buckets=64)
        lsh_sec = round(time.perf_counter() - t0, 2)
        w1 = int(time.time() * 1000)
        t0 = time.perf_counter()
        cn = normalized(emb)
        cents = fit_kmeans(cn.sample(0.2, seed=7), k=8, max_iter=2)
        books = fit_pq_residual(
            cn.sample(0.2, seed=7), cents, m=8, ksub=16, max_iter=1
        )
        write_ivfpq_index(emb, f"{d}/ivfpq", cents, books)
        pq_sec = round(time.perf_counter() - t0, 2)
        w2 = int(time.time() * 1000)
        build_task_stats[label] = {
            "lsh_build_sec": lsh_sec,
            "ivfpq_build_sec": pq_sec,
            "lsh_tasks": _task_stats(w0, w1),
            "ivfpq_tasks": _task_stats(w1, w2),
        }
        shutil.rmtree(d, ignore_errors=True)
        return round(lsh_sec + pq_sec, 2)

    for name, fn in [
        ("index_builds", index_builds_stress),
        ("bm25_topk", bm25_stress),
        ("ivf_pq_topk", ivf_pq_stress),
        ("nb_classifier", nb_stress),
        ("bpe_train5", bpe_stress),
        ("substring_dedup", substring_stress),
        ("mixture_sample", mixture_stress),
        ("index_serving", serving_stress),
        ("t_contamination_shingles_only", contamination_shingles_only_stress),
        ("t_contamination_bounded", contamination_bounded_stress),
        ("lsh_lookup", lsh_lookup_stress),
        ("semdedup", semdedup_stress),
        ("semdedup_exact", semdedup_exact_stress),
        ("pagerank3", pagerank_stress),
    ]:
        if only is not None and name not in only:
            continue
        t1, tn = fn(base), fn(out_dir)
        out[name] = {"t1": t1, "tN": tn, "growth": round(tn / max(t1, 1e-9), 1)}
        print(json.dumps({name: out[name]}), file=sys.stderr)

    gate = GROWTH_GATE * factor
    flagged = {
        name: rec
        for name, rec in out.items()
        if rec["growth"] > gate and name not in DOCUMENTED_SUPERLINEAR
    }
    documented = {
        name: DOCUMENTED_SUPERLINEAR[name]
        for name, rec in out.items()
        if rec["growth"] > gate and name in DOCUMENTED_SUPERLINEAR
    }
    record = {
        "factor": factor,
        "growth_gate": gate,
        "queries": out,
        "flagged": flagged,
        "documented_exceptions": documented,
    }
    if build_task_stats:
        record["build_task_stats"] = build_task_stats
    line = json.dumps(record)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    # the event log served its purpose (build_task_stats) — a 30-100x
    # run's uncompressed log is large and mkdtemp never self-cleans
    import shutil as _sh

    _sh.rmtree(evlog_dir, ignore_errors=True)
    if flagged:
        print(
            f"GATE FAILED: undocumented super-linear growth (> {gate}x "
            f"at {factor}x data): {sorted(flagged)}",
            file=sys.stderr,
        )
        sys.exit(1)


if __name__ == "__main__":
    main()
