"""Product/journey analytics on datachain_spark — the event-stream side
of the engine:

    events -> sliding-window funnel (windowFunnel semantics) ->
    journey paths + Markov transition edges -> cohort retention ->
    SCD2 user-profile historization + point-in-time reads

Run:  python examples/journey_analytics.py [sf_dir]   (default sf0.001)
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import datachain_spark as dc
from pyspark.sql import functions as F

from datachain_spark.ops.cdc import apply_changes_scd2, history_as_of
from datachain_spark.ops.timeseries import (
    cohort_retention,
    event_paths,
    event_transitions,
    funnel_window,
)


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    sess = dc.Session(metastore_dir=tempfile.mkdtemp())
    dc.Session._global = sess
    sess.spark.sparkContext.setLogLevel("ERROR")
    sess.spark.conf.set("spark.sql.shuffle.partitions", "8")
    ev = dc.read_parquet(f"{sf_dir}/events.parquet").df

    # conversion: deepest view->click->purchase chain within 1 h of its
    # own anchor (every view re-anchors; bots bounded by the event cap)
    fw = funnel_window(
        ev, "user_id", "ts", "event_type",
        ["view", "click", "purchase"], 3600, max_events_per_entity=10_000,
    )
    levels = {r["max_level"]: r["n"] for r in
              fw.groupBy("max_level").agg(F.count(F.lit(1)).alias("n")).collect()}
    print("funnel levels:", dict(sorted(levels.items())))

    # journeys: top paths and the transition edge list
    top_paths = (event_paths(ev, "user_id", "ts", "event_type", max_steps=4)
                 .orderBy(F.desc("n_entities")).limit(3).collect())
    print("top paths:", [(r["path"], r["n_entities"]) for r in top_paths])
    edges = event_transitions(ev, "user_id", "ts", "event_type").count()
    print("transition edges:", edges)

    # retention triangle (daily cohorts)
    tri = cohort_retention(ev, "user_id", "ts", 86400)
    print("cohort cells:", tri.count())

    # SCD2: historize a per-user profile (last event type), read as-of
    profile = ev.groupBy("user_id").agg(
        F.max_by("event_type", "ts").alias("last_event")
    ).select(
        "user_id", "last_event",
        F.lit(0).cast("long").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    changes = profile.orderBy("user_id").limit(50).select(
        "user_id", F.lit("churned").alias("last_event"),
        F.lit("U").alias("op"), F.lit(1000).cast("long").alias("ts"),
    )
    n_changes = changes.count()
    hist = apply_changes_scd2(profile, changes, "user_id", "ts")
    before = history_as_of(hist, 500).filter(
        F.col("last_event") == "churned").count()
    after = history_as_of(hist, 1500).filter(
        F.col("last_event") == "churned").count()
    print(f"churned profiles: before={before} after={after} (changes={n_changes})")
    assert before == 0 and after == n_changes
    assert levels and edges > 0


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
