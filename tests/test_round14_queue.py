"""Round-14 queue: implemented + oracle-tested ahead of registration
(rounds 10-13 are spoken for by their own four-entry queues).

vacuum_orphan_scan completes the lakehouse-upkeep tier: compaction
plans the rewrite, MERGE applies it, time travel reads old versions,
zone maps prune, Merkle syncs replicas — VACUUM counts what the
rewrite stranded, from the REAL directory state."""

from __future__ import annotations

from tests.conftest import SF_DIR, assert_frames_match


def test_vacuum_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import storage as st

    assert_frames_match(
        st.vacuum_orphan_scan(spark, SF_DIR),
        duck.execute(st.VACUUM_ORPHAN_SQL),
        ctx="vacuum_orphan_scan",
    )


def test_vacuum_accounting_model(spark):
    """The orphan generation must be exactly the small-files base
    (one file per occupied 64-bucket residue, rows = pre-cutoff
    orders) and the live generation exactly the compacted rewrite —
    recomputed from the orders table in Python, plus the real-files
    invariant that listing = live + orphans with no overlap."""
    import datetime

    from mapreduceece563_spark.operators import storage as st
    from mapreduceece563_spark.sources.catalog import load_table

    cutoff = datetime.datetime.fromisoformat(st.MERGE_CUTOFF)
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderdate"
    ).collect()
    base = [r["o_orderkey"] for r in orders if r["o_orderdate"] < cutoff]
    ins = [r["o_orderkey"] for r in orders if r["o_orderdate"] >= cutoff]
    merged = [k for k in base if k % 13 != 0] + ins
    g = st.vacuum_orphan_scan(spark, SF_DIR).collect()[0]
    assert g["n_orphan_files"] == len(
        {k % st.MERGE_SMALL_BUCKETS for k in base}
    )
    assert g["n_live_files"] == len(
        {k % st.MERGE_COMPACT_BUCKETS for k in merged}
    )
    assert g["n_orphan_rows"] == len(base)
    assert g["n_live_rows"] == len(merged)
    assert g["n_files_listed"] == g["n_live_files"] + g["n_orphan_files"]


def test_vacuum_manifest_is_persisted_and_task_uuid_named(spark):
    """The manifest is REAL persisted parquet naming the compacted
    generation's actual task-UUID files — every name must re-resolve
    against the directory on disk."""
    import os

    from mapreduceece563_spark.operators import storage as st

    _, final_dir, _, _ = st._merge_tables(spark, SF_DIR)
    mdir = st._vacuum_manifest_dir(spark, SF_DIR)
    names = [
        r["file_name"] for r in spark.read.parquet(mdir).collect()
    ]
    assert names and all("/" in n and n.endswith(".parquet") for n in names)
    for n in names:
        assert os.path.isfile(os.path.join(final_dir, n)), n


def test_vacuum_plan_reads_zero_data_columns(spark):
    """The listing scans must project ONLY the _metadata.file_path
    hidden column (ReadSchema: struct<> — no data columns), and the
    manifest join must broadcast."""
    from mapreduceece563_spark.operators import storage as st
    from mapreduceece563_spark.plans import plan_string

    p = plan_string(st.vacuum_orphan_scan(spark, SF_DIR), "formatted")
    assert "ReadSchema: struct<>" in p
    assert "BroadcastHashJoin" in p


def test_round14_queue_on_empty_tables(spark, tmp_path):
    import duckdb
    import pyarrow.parquet as pq

    from mapreduceece563_spark.operators import storage as st
    from mapreduceece563_spark.sources.catalog import TABLES

    d = tmp_path / "empty_sf"
    d.mkdir()
    for t in TABLES:
        schema = pq.read_schema(f"{SF_DIR}/{t}.parquet")
        pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")

    assert_frames_match(
        st.vacuum_orphan_scan(spark, str(d)),
        con.execute(st.VACUUM_ORPHAN_SQL),
        ctx="empty:vacuum_orphan_scan",
    )
    from mapreduceece563_spark.operators import analytics as an

    assert_frames_match(
        an.bootstrap_ci_revenue(spark, str(d)),
        con.execute(an.BOOTSTRAP_CI_SQL),
        ctx="empty:bootstrap_ci_revenue",
    )
    assert_frames_match(
        an.cuped_ab_readout(spark, str(d)),
        con.execute(an.CUPED_AB_SQL),
        ctx="empty:cuped_ab_readout",
    )
    from mapreduceece563_spark.operators import textstats as ts

    assert_frames_match(
        ts.lang_id_cohens_kappa(spark, str(d)),
        con.execute(ts.LANG_KAPPA_SQL),
        ctx="empty:lang_id_cohens_kappa",
    )
    con.close()


def test_bootstrap_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import analytics as an

    assert_frames_match(
        an.bootstrap_ci_revenue(spark, SF_DIR),
        duck.execute(an.BOOTSTRAP_CI_SQL),
        ctx="bootstrap_ci_revenue",
    )


def test_bootstrap_python_model(spark):
    """All 64 replicate means recomputed in pure Python from the
    frozen weight family — the sorted-array index picks must match
    exactly, and the CI must bracket every replicate between its
    order statistics."""
    from mapreduceece563_spark.functions.hashing import HASH_MOD
    from mapreduceece563_spark.operators import analytics as an
    from mapreduceece563_spark.sources.catalog import load_table

    rows = load_table(spark, SF_DIR, "orders").select(
        "o_orderpriority", "o_orderkey", "o_totalprice"
    ).collect()
    by_p: dict = {}
    for r in rows:
        by_p.setdefault(r["o_orderpriority"], []).append(
            (r["o_orderkey"] % HASH_MOD, round(r["o_totalprice"] * 100))
        )
    got = {
        r["o_orderpriority"]: r
        for r in an.bootstrap_ci_revenue(spark, SF_DIR).collect()
    }
    assert set(got) == set(by_p)
    for p, vals in by_p.items():
        means = []
        for b in range(an.BOOT_B):
            wx = sw = 0
            for k, c in vals:
                w = 2 * (
                    ((an.BOOT_A * k + an.BOOT_B_STEP * (b + 1)) % HASH_MOD)
                    % 2
                )
                wx += w * c
                sw += w
            means.append(wx // max(sw, 1))
        means.sort()
        g = got[p]
        assert g["n"] == len(vals)
        assert g["mean_cents"] == sum(c for _, c in vals) // len(vals)
        assert g["ci_lo_cents"] == means[an.BOOT_LO_IDX - 1]
        assert g["ci_hi_cents"] == means[an.BOOT_HI_IDX - 1]
        assert g["ci_lo_cents"] <= g["ci_hi_cents"]


def test_bootstrap_ci_brackets_and_shrinks(spark, tmp_path):
    """Semantic pin: for a homogeneous value distribution the CI
    brackets the true mean, and 100x more rows gives a strictly
    narrower interval (bootstrap convergence) — deterministic here
    because the weights are a frozen hash family, not a PRNG."""
    import datetime

    from mapreduceece563_spark.operators import analytics as an

    ts = datetime.datetime(1995, 6, 1)
    rows = []
    oid = 0
    for i in range(100):
        rows.append((oid, 1, "O", 100.0 + (i % 7), ts, "SMALL", "c", 0, ""))
        oid += 1
    for i in range(10000):
        rows.append((oid, 1, "O", 100.0 + (i % 7), ts, "BIG", "c", 0, ""))
        oid += 1
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string, o_clerk string, o_shippriority int,"
        " o_comment string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))

    got = {
        r["o_orderpriority"]: r
        for r in an.bootstrap_ci_revenue(spark, str(tmp_path)).collect()
    }
    for p in ("SMALL", "BIG"):
        g = got[p]
        assert g["ci_lo_cents"] <= g["mean_cents"] <= g["ci_hi_cents"]
    w_small = got["SMALL"]["ci_hi_cents"] - got["SMALL"]["ci_lo_cents"]
    w_big = got["BIG"]["ci_hi_cents"] - got["BIG"]["ci_lo_cents"]
    assert w_big < w_small


def test_bootstrap_plan_is_one_scan_no_explode(spark):
    """All 64 replicates ride ONE hash aggregate: no Generate
    (explode), no join, one exchange keyed on the group column."""
    from mapreduceece563_spark.operators import analytics as an
    from mapreduceece563_spark.plans import plan_string

    p = plan_string(an.bootstrap_ci_revenue(spark, SF_DIR), "simple")
    assert "Generate" not in p
    assert "Join" not in p
    # invariant (not a node count): every KEYED exchange in the plan
    # keys on the group column — a second, differently-keyed shuffle
    # would mean the 64 replicates stopped riding one hash aggregate.
    # One RoundRobinPartitioning is allowed: load_table(spread=True)
    # fans the single-row-group test scan across cores BELOW the
    # map-side partial aggregate (r13), it carries no aggregate state.
    import re

    exchanges = re.findall(r"Exchange (\w+)\(([^,#)]*)", p)
    keyed = [(k, key) for k, key in exchanges if k == "hashpartitioning"]
    rr = [(k, key) for k, key in exchanges if k == "RoundRobinPartitioning"]
    assert keyed, p
    assert len(keyed) + len(rr) == len(exchanges), exchanges
    assert len(rr) <= 1, exchanges
    assert all(key == "o_orderpriority" for _, key in keyed), exchanges


def test_cuped_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import analytics as an

    assert_frames_match(
        an.cuped_ab_readout(spark, SF_DIR),
        duck.execute(an.CUPED_AB_SQL),
        ctx="cuped_ab_readout",
    )


def test_cuped_python_model(spark):
    """Pooled theta and per-variant adjusted means recomputed in pure
    Python with the SAME operation order (division -> subtraction ->
    multiplication -> floor)."""
    import datetime
    import math

    from mapreduceece563_spark.functions.hashing import HASH_MOD
    from mapreduceece563_spark.operators import analytics as an
    from mapreduceece563_spark.sources.catalog import load_table

    split = datetime.datetime.fromisoformat(an.KS_SPLIT)
    rows = load_table(spark, SF_DIR, "events").select(
        "user_id", "ts", "value"
    ).collect()
    per_user: dict = {}
    for r in rows:
        x, y = per_user.setdefault(r["user_id"], [0, 0])
        c = round(r["value"] * 100)
        if r["ts"] >= split:
            per_user[r["user_id"]] = [x, y + c]
        else:
            per_user[r["user_id"]] = [x + c, y]
    n = len(per_user)
    sx = sum(x for x, _ in per_user.values())
    sy = sum(y for _, y in per_user.values())
    sxy = sum(x * y for x, y in per_user.values())
    sx2 = sum(x * x for x, _ in per_user.values())
    theta = float(n * sxy - sx * sy) / float(n * sx2 - sx * sx)
    got = {
        r["variant"]: r for r in an.cuped_ab_readout(spark, SF_DIR).collect()
    }
    by_v: dict = {}
    for u, (x, y) in per_user.items():
        v = ((an.CUPED_A * (u % HASH_MOD) + an.CUPED_B) % HASH_MOD) % 2
        nv, sxv, syv = by_v.setdefault(v, [0, 0, 0])
        by_v[v] = [nv + 1, sxv + x, syv + y]
    assert set(got) == set(by_v)
    for v, (nv, sxv, syv) in by_v.items():
        g = got[v]
        assert (g["n_users"], g["mean_post_cents"]) == (nv, syv // nv)
        assert g["theta_milli"] == math.floor(1000.0 * theta)
        adj = (float(syv) / nv) - theta * (
            (float(sxv) / nv) - (float(sx) / n)
        )
        assert g["adj_mean_milli"] == math.floor(1000.0 * adj)


def test_cuped_removes_preperiod_variance(spark, tmp_path):
    """Semantic pin: when post == pre for every user (y = x, a pure
    carry-over world), theta == 1 exactly and BOTH variants' adjusted
    means collapse to the pooled mean — the raw means differ by the
    luck of the hash split, the adjusted ones cannot."""
    import datetime

    from mapreduceece563_spark.operators import analytics as an

    split = datetime.datetime.fromisoformat(an.KS_SPLIT)
    before = split - datetime.timedelta(days=3)
    after = split + datetime.timedelta(days=3)
    rows, eid = [], 0
    for u in range(200):
        spend = 1.0 + (u % 13) * 7.0  # heavy between-user variance
        rows.append((eid, before, u, "buy", spend, "{}")); eid += 1
        rows.append((eid, after, u, "buy", spend, "{}")); eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    got = {
        r["variant"]: r
        for r in an.cuped_ab_readout(spark, str(tmp_path)).collect()
    }
    assert set(got) == {0, 1}
    assert got[0]["theta_milli"] == 1000
    assert got[1]["theta_milli"] == 1000
    assert got[0]["adj_mean_milli"] == got[1]["adj_mean_milli"]
    assert got[0]["mean_post_cents"] != got[1]["mean_post_cents"]


def test_cuped_plan_is_per_user_then_broadcast(spark):
    """One per-user aggregate feeds both moment rollups; the pooled
    1-row frame joins back by broadcast; nothing windows or joins per
    event."""
    from mapreduceece563_spark.operators import analytics as an
    from mapreduceece563_spark.plans import plan_string

    p = plan_string(an.cuped_ab_readout(spark, SF_DIR), "simple")
    assert "Window" not in p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p \
        or "BroadcastExchange" in p
    assert "SortMergeJoin" not in p


def test_kappa_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import textstats as ts

    assert_frames_match(
        ts.lang_id_cohens_kappa(spark, SF_DIR),
        duck.execute(ts.LANG_KAPPA_SQL),
        ctx="lang_id_cohens_kappa",
    )


def test_kappa_python_model(spark):
    """Textbook kappa from the confusion matrix the op itself
    summarizes, including the signed clamped float division."""
    import math

    from mapreduceece563_spark.operators import textstats as ts

    conf = {
        (r["labeled_lang"], r["predicted_lang"]): r["n_docs"]
        for r in ts.lang_confusion_matrix(spark, SF_DIR).collect()
    }
    n = sum(conf.values())
    diag = sum(v for (a, b), v in conf.items() if a == b)
    rowt: dict = {}
    colt: dict = {}
    for (a, b), v in conf.items():
        rowt[a] = rowt.get(a, 0) + v
        colt[b] = colt.get(b, 0) + v
    s = sum(rowt[c] * colt.get(c, 0) for c in rowt)
    g = ts.lang_id_cohens_kappa(spark, SF_DIR).collect()[0]
    assert (g["n"], g["n_agree"]) == (n, diag)
    assert g["po_ppm"] == diag * 1_000_000 // n
    assert g["pe_ppm"] == s * 1_000_000 // (n * n)
    want = math.floor(1e6 * float(n * diag - s) / float(n * n - s))
    assert g["kappa_ppm"] == max(-1_000_000, min(1_000_000, want))


def test_kappa_semantic_pins(spark, tmp_path):
    """A corpus whose texts ARE their labels' marker words must score
    kappa == 1e6 exactly (perfect chance-corrected agreement); a
    single-class corpus (every doc the same lang, predictor agrees)
    has degenerate marginals -> NULL."""
    from mapreduceece563_spark.operators import textstats as ts
    from mapreduceece563_spark.operators.textstats import LANG_MARKERS

    langs = sorted(LANG_MARKERS)[:4]
    rows = []
    for i, lang in enumerate(langs * 10):
        text = " ".join(list(LANG_MARKERS[lang])[:3] * 2)
        rows.append((i, text, lang, "s", len(text)))
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    g = ts.lang_id_cohens_kappa(spark, str(tmp_path)).collect()[0]
    assert g["po_ppm"] == 1_000_000
    assert g["kappa_ppm"] == 1_000_000

    mono = tmp_path / "mono"
    mono.mkdir()
    lang = langs[0]
    text = " ".join(list(LANG_MARKERS[lang])[:3])
    spark.createDataFrame(
        [(i, text, lang, "s", len(text)) for i in range(10)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(mono / "documents.parquet"))
    g2 = ts.lang_id_cohens_kappa(spark, str(mono)).collect()[0]
    assert g2["po_ppm"] == 1_000_000
    assert g2["kappa_ppm"] is None  # n^2 == S: undefined, not faked


def test_kappa_plan_is_confusion_bounded(spark):
    """Everything after the |langs|^2 confusion rollup is arithmetic
    on one-row frames: no window, and no exchange keyed on doc_id
    beyond the label join's."""
    from mapreduceece563_spark.operators import textstats as ts
    from mapreduceece563_spark.plans import plan_string

    p = plan_string(ts.lang_id_cohens_kappa(spark, SF_DIR), "simple")
    assert "Window" not in p
    assert "row_number" not in p
