package graft

import graft.operators.CurrentState
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** B1/B3 storage lifecycle: the physical TTL (partition drop) over the
  * day-partitioned MergeTree-style layout.
  */
class StorageLifecycleSpec extends SparkSpecBase {

  test("dropExpiredDayPartitions removes only expired day= dirs, keeps the rest intact") {
    val out = s"${sys.props("java.io.tmpdir")}/graft_ttl_spec"
    val e = Tables.events(spark, sf).select("event_id", "user_id", "value", "ts")
    CurrentState.writePartitionedByDay(e, "ts", "user_id", out)

    val days = spark.read.parquet(out)
      .select(col("day").cast("string")).distinct()
      .collect().map(_.getString(0)).sorted
    assert(days.length >= 3, s"need ≥3 day partitions to test, got ${days.toSeq}")
    val cutoff = days(days.length / 2)
    val expectedKeptRows = CurrentState.withDayPartition(e, "ts")
      .filter(col("day") >= cutoff).count()

    val dropped = CurrentState.dropExpiredDayPartitions(spark, out, cutoff)
    assert(dropped == days.filter(_ < cutoff).toSeq, s"dropped=$dropped")

    val back = spark.read.parquet(out)
    val backDays = back.select(col("day").cast("string")).distinct()
      .collect().map(_.getString(0)).sorted
    assert(backDays.toSeq == days.filter(_ >= cutoff).toSeq)
    assert(back.count() == expectedKeptRows) // kept data untouched

    // idempotent: nothing left to drop at the same cutoff
    assert(CurrentState.dropExpiredDayPartitions(spark, out, cutoff).isEmpty)
  }

  test("dropExpiredDayPartitions on a missing path is a no-op") {
    assert(CurrentState.dropExpiredDayPartitions(spark,
      s"${sys.props("java.io.tmpdir")}/graft_ttl_nonexistent", "20240101").isEmpty)
  }
}
