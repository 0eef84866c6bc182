"""Closed-form checks of the event-analytics primitives (funnel,
retention, anomaly, conversion latency) on hand-built event logs —
the oracle gate pins Spark==DuckDB agreement; these pin that the
agreed answer is the INTENDED one (ordering strictness, cohort
arithmetic, z-score moments).
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (i, datetime.datetime(2026, 1, 1) + datetime.timedelta(seconds=s),
             u, t, 0.0, "{}")
            for i, (u, t, s) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_funnel_requires_strict_order(spark, tmp_path):
    rows = [
        # user 1: full ordered funnel
        (1, "view", 0), (1, "click", 10), (1, "purchase", 20),
        # user 2: click BEFORE view — stops at stage 1
        (2, "click", 0), (2, "view", 10), (2, "purchase", 20),
        # user 3: view+click, purchase at the SAME second as click (tie
        # is non-qualifying under strictly-greater)
        (3, "view", 0), (3, "click", 10), (3, "purchase", 10),
        # user 4: never views
        (4, "click", 0), (4, "purchase", 10),
    ]
    _events(spark, rows).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    from sherlock_spark.queries import q_rel_events_funnel

    got = {
        r["funnel_stage"]: r["n_users"]
        for r in q_rel_events_funnel(spark, str(tmp_path)).collect()
    }
    # user 2 DOES qualify for stage 2: their first view (t=10) precedes
    # their purchase (t=20), and funnel stage 2 needs a click after the
    # first view — user 2's click is at t=0 < 10, so NOT qualified.
    assert got == {
        "1_view": 3,            # users 1, 2, 3 viewed
        "2_view_click": 2,      # users 1, 3 clicked after first view
        "3_view_click_purchase": 1,  # only user 1 (user 3's tie fails)
    }


def test_retention_offsets(spark, tmp_path):
    wk = 7 * 86400
    rows = [
        (1, "view", 0), (1, "view", 1),          # wk 0 twice -> one row
        (1, "click", 2 * wk),                     # returns wk offset 2
        (2, "view", wk), (2, "view", wk + wk),    # cohort wk1, offset 0+1
    ]
    _events(spark, rows).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    from sherlock_spark.queries import q_rel_events_retention

    got = {
        (r["cohort_wk"], r["wk_offset"]): r["n_users"]
        for r in q_rel_events_retention(spark, str(tmp_path)).collect()
    }
    # absolute week numbers depend on the session timezone; the cohort
    # STRUCTURE (offsets relative to the earliest cohort) is what the
    # operator defines
    base = min(c for c, _ in got)
    assert got == {
        (base, 0): 1,
        (base, 2): 1,
        (base + 1, 0): 1,
        (base + 1, 1): 1,
    }


def test_conversion_latency_first_purchase_after_first_view(spark, tmp_path):
    rows = [
        (1, "view", 100), (1, "purchase", 50),   # purchase BEFORE view
        (1, "purchase", 400),                     # counted: 300 s
        (2, "view", 0), (2, "purchase", 100),     # 100 s
        (3, "purchase", 10),                      # never views: excluded
    ]
    _events(spark, rows).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    from sherlock_spark.queries import q_rel_conversion_latency

    row = q_rel_conversion_latency(spark, str(tmp_path)).collect()[0]
    assert row["n_converted"] == 2
    assert row["p50_s"] == 200.0  # median of {300, 100} interpolated


def test_upsample_copy_counts(spark, tmp_path):
    import hashlib

    docs = spark.createDataFrame(
        [(i, "t", "en" if i % 2 == 0 else "zz", "s", 1) for i in range(200)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from sherlock_spark.queries import _UP_SALT, _UP_WEIGHTS, q_text_upsample

    got = {
        r["doc_id"]: r["n_copies"]
        for r in q_text_upsample(spark, str(tmp_path)).collect()
    }
    # en carries weight 2.3: every en doc gets 2 copies, and exactly the
    # md5-threshold subset gets a third — replicated here independently
    frac = _UP_WEIGHTS["en"] % 1
    thr = format(int(frac * 16**8), "08x")
    for doc_id, n in got.items():
        if doc_id % 2 == 1:           # zz -> default weight 1.0
            assert n == 1
        else:
            bucket = hashlib.md5(
                f"{_UP_SALT}:{doc_id}".encode()
            ).hexdigest()[:8]
            assert n == 2 + (1 if bucket < thr else 0)
    # deterministic: second run identical
    again = {
        r["doc_id"]: r["n_copies"]
        for r in q_text_upsample(spark, str(tmp_path)).collect()
    }
    assert again == got


def test_render_chat_order_and_roles(spark, tmp_path):
    import hashlib

    # transcripts_from_documents maps doc_id -> (conv c{id%100},
    # turn id//100, role by id%3); ids 0/100/200 form conversation c0
    docs = spark.createDataFrame(
        [
            (0, "hello", "en", "s", 5),
            (100, "hi there", "en", "s", 8),
            (200, "logged", "en", "s", 6),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from sherlock_spark.queries import q_text_render_chat

    row = q_text_render_chat(spark, str(tmp_path)).collect()[0]
    rendered = "user: hello\nassistant: hi there\ntool: logged"
    assert row["conv_id"] == "c0"
    assert row["n_turns"] == 3
    assert row["n_chars"] == len(rendered)
    assert row["rendered_md5"] == hashlib.md5(rendered.encode()).hexdigest()
