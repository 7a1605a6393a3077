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

  test("compactDayPartitions merges small files per day, preserving data and clustering") {
    val out = s"${sys.props("java.io.tmpdir")}/graft_compact_spec"
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(out), true)

    // Simulate a streaming sink: three appends × several tasks → many
    // small files per day partition.
    val e = CurrentState.withDayPartition(
      Tables.events(spark, sf).select("event_id", "user_id", "value", "ts"), "ts")
    (1 to 3).foreach { _ =>
      e.repartition(4).write.mode("append").partitionBy("day").parquet(out)
    }
    def filesPerDay(): Map[String, Int] =
      fs.listStatus(new org.apache.hadoop.fs.Path(out)).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("day="))
        .map(d => d.getPath.getName ->
          fs.listStatus(d.getPath).count(f => f.getPath.getName.endsWith(".parquet")))
        .toMap
    assert(filesPerDay().values.forall(_ >= 3), "setup should create many files")
    val before = spark.read.parquet(out)
      .orderBy("event_id").collect().map(_.toSeq)

    val compacted = CurrentState.compactDayPartitions(spark, out, "user_id", "ts")
    assert(compacted.nonEmpty)
    assert(filesPerDay().values.forall(_ == 1), s"still fragmented: ${filesPerDay()}")
    val after = spark.read.parquet(out)
      .orderBy("event_id").collect().map(_.toSeq)
    assert(after.sameElements(before)) // merge rewrites, never loses

    // idempotent: already at the target file count
    assert(CurrentState.compactDayPartitions(spark, out, "user_id", "ts").isEmpty)
  }
}
