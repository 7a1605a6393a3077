package graft.queries

import graft.operators.{CurrentState, ScaleOps}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, SparkSession}

/** B-group storage/write-path queries. Unlike the rest of the query
  * map these run the real writers first, then answer an
  * oracle-checkable question from the READ-BACK data — proving the
  * layout round-trips bit-exactly (the oracle reads the original
  * table, so any loss or duplication in the write path breaks the
  * hash match), not merely that the writer didn't throw.
  *
  * - b2: `PARTITION BY toYYYYMMDD(ts) ORDER BY (key, ts)` MergeTree
  *   layout (/root/reference/schema/schema-local.sql:184-185) via
  *   [[CurrentState.writePartitionedByDay]].
  * - b6: MergeTree ORDER-BY join locality via [[ScaleOps.writeBucketed]]
  *   — the join itself is exchange-free (asserted in ScaleOpsSpec /
  *   StorageSpec; only the final small aggregation shuffles).
  * - b7: skew-safe two-phase salted aggregation ([[ScaleOps.saltedSum]])
  *   returning exactly the plain aggregation.
  */
object StorageQueries {

  /** Deterministic scratch dir per (query, input-dir) so warm runs at
    * one sf never collide with timed runs at another.
    */
  private def tmp(name: String, dir: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_${name}_${math.abs(dir.hashCode)}"

  /** Drop a managed table AND its location — a crashed previous run
    * can leave the directory behind without the catalog entry, which
    * would fail the next CTAS.
    */
  private def resetTable(s: SparkSession, table: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    loc.getFileSystem(s.sparkContext.hadoopConfiguration).delete(loc, true)
  }

  val defs: Seq[QueryDef] = Seq(

    // B2: write the day-partitioned key-clustered layout, read it back
    // through partition discovery, and per-day aggregate — day counts,
    // distinct keys and the exact decimal value sum must all survive
    // the round-trip.
    QueryDef("b2_clustered_layout",
      (s, dir) => {
        val out = tmp("b2", dir)
        CurrentState.writePartitionedByDay(
          Tables.events(s, dir).select("event_id", "user_id", "value", "ts"),
          "ts", "user_id", out)
        s.read.parquet(out)
          .groupBy(col("day").cast("string").as("day"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("user_id")).as("n_users"),
            QueryDefs.dsum(col("value")).as("sum_value"))
          .orderBy("day")
      },
      Some(s"""SELECT strftime(CAST(ts AS TIMESTAMP), '%Y%m%d') AS day,
          COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users,
          ${QueryDefs.sqlDsum("value")} AS sum_value
        FROM events GROUP BY 1 ORDER BY day""")),

    // B6: bucket both join sides on the key, join exchange-free, and
    // aggregate — the answer must equal the oracle's plain join over
    // the original tables.
    QueryDef("b6_bucketed_join",
      (s, dir) => {
        val suf = math.abs(dir.hashCode).toString
        val (ot, ct) = (s"g_orders_b_$suf", s"g_customer_b_$suf")
        resetTable(s, ot); resetTable(s, ct)
        ScaleOps.writeBucketed(Tables.orders(s, dir)
          .select(col("o_custkey").as("custkey"), col("o_totalprice")), ot, "custkey", 8)
        ScaleOps.writeBucketed(Tables.customer(s, dir)
          .select(col("c_custkey").as("custkey"), col("c_mktsegment")), ct, "custkey", 8)
        ScaleOps.bucketedJoin(s, ot, ct, "custkey")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"),
            QueryDefs.dsum(col("o_totalprice")).as("sum_price"))
          .orderBy("c_mktsegment")
      },
      Some(s"""SELECT c_mktsegment, COUNT(*) AS n,
          ${QueryDefs.sqlDsum("o_totalprice")} AS sum_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1 ORDER BY c_mktsegment""")),

    // B7: salted two-phase aggregation ≡ plain aggregation (decimal
    // partials merge exactly, so the split into salt groups is
    // invisible in the result).
    QueryDef("b7_salted_agg",
      (s, dir) => ScaleOps.saltedSum(Tables.events(s, dir), "event_type", "value", 8)
        .orderBy("event_type"),
      Some(s"""SELECT event_type, ${QueryDefs.sqlDsum("value")} AS sum_value
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // B8: salted skew-safe JOIN ≡ plain join (each left row meets
    // exactly one right replica, the one sharing its salt).
    QueryDef("b8_salted_join",
      (s, dir) => ScaleOps.saltedJoin(
          Tables.orders(s, dir).select(col("o_custkey").as("custkey"), col("o_totalprice")),
          Tables.customer(s, dir).select(col("c_custkey").as("custkey"), col("c_mktsegment")),
          "custkey", 8)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          QueryDefs.dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("c_mktsegment"),
      Some(s"""SELECT c_mktsegment, COUNT(*) AS n,
          ${QueryDefs.sqlDsum("o_totalprice")} AS sum_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1 ORDER BY c_mktsegment""")),

    // B11: AggregatingMergeTree semantics (CH `-State` / `-Merge`
    // combinators): partial aggregate STATES are materialized per
    // (day, type) — count, exact-decimal sum, min, max are all
    // mergeable — written day-partitioned, read back, and MERGED into
    // per-type finals. The oracle aggregates the raw table directly:
    // state-merge must be indistinguishable from a one-shot
    // aggregation (the property that lets a 100 TB deployment roll
    // day states up into month/total reports without re-reading raw
    // data). `n_states` exposes that states, not raw rows, were read.
    QueryDef("b11_agg_state",
      (s, dir) => {
        val out = tmp("b11", dir)
        Tables.events(s, dir)
          .groupBy(date_format(col("ts"), "yyyyMMdd").as("day"), col("event_type"))
          .agg(count(lit(1)).as("cnt_state"),
            sum(col("value").cast("decimal(18,2)")).as("sum_state"),
            min(unix_micros(col("ts"))).as("min_ts_state"),
            max(col("value")).as("max_state"))
          .write.mode("overwrite").partitionBy("day").parquet(out)
        s.read.parquet(out)
          .groupBy("event_type")
          .agg(sum(col("cnt_state")).as("n"),
            sum(col("sum_state")).cast("double").as("sum_value"),
            min(col("min_ts_state")).as("first_us"),
            max(col("max_state")).as("max_value"),
            count(lit(1)).as("n_states"))
          .orderBy("event_type")
      },
      Some(s"""SELECT event_type, COUNT(*) AS n,
          ${QueryDefs.sqlDsum("value")} AS sum_value,
          min(epoch_us(CAST(ts AS TIMESTAMP))) AS first_us,
          max(value) AS max_value,
          COUNT(DISTINCT strftime(CAST(ts AS TIMESTAMP), '%Y%m%d')) AS n_states
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // B12: bloom-prefiltered semi join (ScaleOps.bloomSemiJoin) — the
    // build side (~1% of orders) is hashed into a deterministic
    // bitset, probed inside lineitem's scan filter, and the exact
    // semi join confirms survivors. The oracle is the PLAIN semi
    // join: bloom false positives must be invisible in the output
    // (removed by the confirm join), false negatives impossible — so
    // the hash match proves the reduction is a pure optimization.
    QueryDef("b12_bloom_semi_join",
      // numBits defaulted: the executable sizing rule derives it from
      // a build-side count (BloomUtil.sizeFor — pow2 ≥ 10·|keys|).
      (s, dir) => ScaleOps.bloomSemiJoin(
          Tables.lineitem(s, dir), "l_orderkey",
          Tables.orders(s, dir).filter(col("o_custkey") % 100 === 0)
            .select("o_orderkey"),
          "o_orderkey")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), QueryDefs.dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("l_returnflag"),
      Some(s"""SELECT l_returnflag, COUNT(*) AS n,
          ${QueryDefs.sqlDsum("l_quantity")} AS sum_qty
        FROM lineitem WHERE l_orderkey IN (
          SELECT o_orderkey FROM orders WHERE o_custkey % 100 = 0)
        GROUP BY 1 ORDER BY l_returnflag""")),

    // B13: schema-evolution round-trip — the lifecycle fact of any
    // long-lived 100 TB table: a column (`value2`) exists only in
    // NEWER partitions. Old and new eras are written with their own
    // schemas, read back through parquet `mergeSchema` + partition
    // discovery, and aggregated per era. The oracle computes the
    // same numbers from the RAW table, so the hash match proves the
    // merged read is lossless: old rows surface value2 as NULL
    // (n_value2 = 0), new rows carry exact values — no row loss, no
    // column bleed across eras.
    QueryDef("b13_schema_evolution",
      (s, dir) => {
        val out = tmp("b13", dir)
        val hadoopPath = new org.apache.hadoop.fs.Path(out)
        hadoopPath.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(hadoopPath, true)
        val ev = Tables.events(s, dir).select("event_id", "user_id", "value")
        ev.filter(col("event_id") % 2 === 0)
          .write.mode("overwrite").parquet(s"$out/era=1")
        ev.filter(col("event_id") % 2 === 1)
          .withColumn("value2", col("value").cast("decimal(18,2)") * 2)
          .write.mode("overwrite").parquet(s"$out/era=2")
        s.read.option("mergeSchema", "true").parquet(out)
          .groupBy(col("era").cast("int").as("era"))
          .agg(count(lit(1)).as("n"),
            QueryDefs.dsum(col("value")).as("sum_value"),
            count(col("value2")).as("n_value2"),
            sum(col("value2")).cast("double").as("sum_value2"))
          .orderBy("era")
      },
      Some(s"""SELECT CASE WHEN event_id % 2 = 0 THEN 1 ELSE 2 END AS era,
          COUNT(*) AS n, ${QueryDefs.sqlDsum("value")} AS sum_value,
          COUNT(CASE WHEN event_id % 2 = 1 THEN 1 END) AS n_value2,
          CAST(SUM(CASE WHEN event_id % 2 = 1
            THEN CAST(value AS DECIMAL(18,2)) * 2 END) AS DOUBLE) AS sum_value2
        FROM events GROUP BY 1 ORDER BY era""")),

    // B12b: bloom-SPLIT anti join (ScaleOps.bloomAntiJoin) — rows
    // failing the probe are definite non-members and bypass the
    // shuffle entirely; only the might-contain sliver takes the exact
    // anti join. Oracle = plain NOT IN anti join.
    QueryDef("b12b_bloom_anti_join",
      (s, dir) => ScaleOps.bloomAntiJoin(
          Tables.lineitem(s, dir), "l_orderkey",
          Tables.orders(s, dir).filter(col("o_custkey") % 100 === 0)
            .select("o_orderkey"),
          "o_orderkey")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), QueryDefs.dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("l_returnflag"),
      Some(s"""SELECT l_returnflag, COUNT(*) AS n,
          ${QueryDefs.sqlDsum("l_quantity")} AS sum_qty
        FROM lineitem WHERE l_orderkey NOT IN (
          SELECT o_orderkey FROM orders WHERE o_custkey % 100 = 0)
        GROUP BY 1 ORDER BY l_returnflag""")),

    // B14: Z-ORDER clustered layout — the multi-dimensional
    // generalization of b2's single-key clustering (CH ORDER BY
    // tuples / Delta OPTIMIZE ZORDER): positions quantize to an
    // 8-bit × 8-bit grid, the Morton code interleaves the bits, and
    // the write range-partitions + sorts ON z — so every file covers
    // a compact z interval (pairwise-disjoint ranges, spec-pinned)
    // and a 2-D box predicate becomes a handful of z ranges whose
    // parquet min/max stats skip whole files. The bit interleave is
    // generated from ONE Scala loop into both engines (integer
    // shifts/masks — nothing to quantize); the oracled result is the
    // read-back octant aggregation, which must equal the same
    // aggregation straight off the raw table (layout is invisible to
    // results — the b2 round-trip contract).
    QueryDef("b14_zorder_layout",
      (s, dir) => {
        val out = tmp("b14", dir)
        val lat = (col("value") % 90.0) - 45.0
        val lon = ((col("event_id") * 7) % 360).cast("double") - 179.5
        val qx = floor((lon + 180.0) * 256.0 / 360.0).cast("int")
        val qy = floor((lat + 45.0) * 256.0 / 90.0).cast("int")
        val z = ZOrder.morton(qx, qy)
        Tables.events(s, dir)
          .select(col("event_id"), col("value"), z.as("z"))
          .repartitionByRange(8, col("z"))
          .sortWithinPartitions("z")
          .write.mode("overwrite").parquet(out)
        s.read.parquet(out)
          .groupBy(shiftright(col("z"), 9).as("octant"))
          .agg(count(lit(1)).as("n"), QueryDefs.dsum(col("value")).as("sum_value"))
          .orderBy("octant")
      },
      Some(s"""WITH pos AS (
          SELECT event_id, value,
            CAST(floor((CAST((event_id * 7) % 360 AS DOUBLE) - 179.5 + 180.0) * 256.0 / 360.0) AS INT) AS qx,
            CAST(floor(((value % 90.0) - 45.0 + 45.0) * 256.0 / 90.0) AS INT) AS qy
          FROM events),
        zed AS (SELECT event_id, value, ${ZOrder.mortonSql("qx", "qy")} AS z FROM pos)
        SELECT z >> 9 AS octant, COUNT(*) AS n,
          ${QueryDefs.sqlDsum("value")} AS sum_value
        FROM zed GROUP BY 1 ORDER BY octant"""))
  )
}

/** Morton (Z-order) bit interleave over two 8-bit cell coordinates,
  * generated from one loop into both the Spark Column tree and the
  * oracle SQL: z = Σ_i ((qx>>i)&1)<<2i | ((qy>>i)&1)<<(2i+1).
  */
private[graft] object ZOrder {
  def morton(qx: Column, qy: Column): Column =
    (0 until 8).map { i =>
      shiftleft(shiftright(qx, i).bitwiseAND(lit(1)), 2 * i) +
        shiftleft(shiftright(qy, i).bitwiseAND(lit(1)), 2 * i + 1)
    }.reduce(_ + _)

  def mortonSql(qx: String, qy: String): String =
    (0 until 8).map { i =>
      s"((($qx >> $i) & 1) << ${2 * i}) + ((($qy >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")
}
