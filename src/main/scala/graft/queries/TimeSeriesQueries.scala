package graft.queries

import graft.functions.HashFunctions
import graft.operators.AsOfJoin
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Time-series / sequence analytics extending the D/E groups: ASOF
  * join, sessionization, gap filling, hash sampling, ordered array
  * aggregation — the ClickHouse-style operations an analytics user of
  * the reference would reach for next.
  */
object TimeSeriesQueries {

  private def ev(s: SparkSession, dir: String): DataFrame = Tables.events(s, dir)

  val defs: Seq[QueryDef] = Seq(

    // E18: ASOF join — each click matched to the user's latest
    // preceding purchase (CH ASOF JOIN; oracle uses DuckDB's native
    // ASOF LEFT JOIN).
    QueryDef("e18_asof_join",
      (s, dir) => {
        val e = ev(s, dir)
        val clicks = e.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        AsOfJoin.joinAsOf(clicks, purchases, "user_id", "ts", "ts",
            Seq("ts", "value"), "event_id")
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"),
            unix_micros(col("asof_ts")).as("purchase_ts_us"),
            col("asof_value").as("purchase_value"))
          .orderBy("event_id")
      },
      Some("""SELECT l.event_id, l.user_id,
          epoch_us(CAST(l.ts AS TIMESTAMP)) AS ts_us,
          epoch_us(CAST(r.ts AS TIMESTAMP)) AS purchase_ts_us,
          r.value AS purchase_value
        FROM (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click') l
        ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') r
          ON l.user_id = r.user_id AND l.ts >= r.ts
        ORDER BY l.event_id""")),

    // E18b: FORWARD ASOF — each click matched to the user's earliest
    // FOLLOWING purchase (DuckDB's native ASOF is backward-only, so
    // the oracle states the semantics as a windowed arg-min).
    QueryDef("e18b_asof_forward",
      (s, dir) => {
        val e = ev(s, dir)
        val clicks = e.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        AsOfJoin.joinAsOfForward(clicks, purchases, "user_id", "ts", "ts",
            Seq("ts", "value"), "event_id")
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"),
            unix_micros(col("asof_ts")).as("purchase_ts_us"),
            col("asof_value").as("purchase_value"))
          .orderBy("event_id")
      },
      Some("""WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        p AS (SELECT user_id, ts, value, event_id AS rid FROM events WHERE event_type = 'purchase'),
        j AS (
          SELECT c.event_id, p.ts AS pts, p.value AS pv,
            row_number() OVER (PARTITION BY c.event_id ORDER BY p.ts ASC, p.rid ASC) AS rn
          FROM c JOIN p ON p.user_id = c.user_id AND p.ts >= c.ts)
        SELECT c.event_id, c.user_id, epoch_us(CAST(c.ts AS TIMESTAMP)) AS ts_us,
          epoch_us(CAST(j.pts AS TIMESTAMP)) AS purchase_ts_us, j.pv AS purchase_value
        FROM c LEFT JOIN (SELECT event_id, pts, pv FROM j WHERE rn = 1) j USING (event_id)
        ORDER BY c.event_id""")),

    // D7: sessionization — 30-minute-gap sessions per user (window
    // lag + cumulative sum; one shuffle on the key).
    QueryDef("d7_sessionize",
      (s, dir) => {
        val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val cum = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev(s, dir)
          .withColumn("ts_us", unix_micros(col("ts")))
          .withColumn("new_sess",
            when(lag(col("ts_us"), 1).over(byUser).isNull ||
              col("ts_us") - lag(col("ts_us"), 1).over(byUser) > 30L * 60 * 1000000, 1)
              .otherwise(lit(0)))
          .withColumn("session_idx", sum(col("new_sess")).over(cum))
          .groupBy("user_id", "session_idx")
          .agg(count(lit(1)).as("n_events"),
            min(col("ts_us")).as("start_us"), max(col("ts_us")).as("end_us"))
          .orderBy("user_id", "session_idx")
      },
      Some("""WITH g AS (
          SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
            CASE WHEN lag(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER w IS NULL THEN 1
                 WHEN epoch_us(CAST(ts AS TIMESTAMP)) - lag(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER w
                      > 30 * 60 * 1000000 THEN 1 ELSE 0 END AS new_sess
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        sess AS (
          SELECT user_id, ts_us,
            -- CAST: DuckDB's windowed SUM yields HUGEINT, which pandas
            -- widens to float64; Spark's is int64 — same values, hash
            -- mismatch without the cast.
            CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
          FROM g)
        SELECT user_id, session_idx, COUNT(*) AS n_events,
          MIN(ts_us) AS start_us, MAX(ts_us) AS end_us
        FROM sess GROUP BY user_id, session_idx
        ORDER BY user_id, session_idx""")),

    // D8: gap-filled hourly series (CH `WITH FILL` analog): hour spine
    // × event types, zero-filled counts.
    QueryDef("d8_gap_fill",
      (s, dir) => {
        val e = ev(s, dir)
        val counts = e.groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
          .agg(count(lit(1)).as("n"))
        val bounds = e.agg(date_trunc("hour", min(col("ts"))).as("lo"),
          date_trunc("hour", max(col("ts"))).as("hi"))
        val spine = bounds.select(explode(
          sequence(col("lo"), col("hi"), expr("INTERVAL 1 HOUR"))).as("hour"))
        val types = e.select("event_type").distinct()
        spine.crossJoin(broadcast(types))
          .join(counts, Seq("hour", "event_type"), "left")
          .select(unix_micros(col("hour")).as("hour_us"), col("event_type"),
            coalesce(col("n"), lit(0L)).as("n"))
          .orderBy("hour_us", "event_type")
      },
      Some("""WITH bounds AS (
          SELECT date_trunc('hour', CAST(min(ts) AS TIMESTAMP)) AS lo,
                 date_trunc('hour', CAST(max(ts) AS TIMESTAMP)) AS hi
          FROM events),
        spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM bounds),
        types AS (SELECT DISTINCT event_type FROM events),
        counts AS (
          SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type, COUNT(*) AS n
          FROM events GROUP BY 1, 2)
        SELECT epoch_us(s.hour) AS hour_us, t.event_type, coalesce(c.n, 0) AS n
        FROM spine s CROSS JOIN types t
        LEFT JOIN counts c ON c.hour = s.hour AND c.event_type = t.event_type
        ORDER BY hour_us, t.event_type""")),

    // D13: gap-filled series with LINEAR INTERPOLATION (CH `WITH FILL
    // ... INTERPOLATE`): 10-minute buckets of mean value per type;
    // missing buckets get the straight line between their nearest
    // observed neighbors. Scale shape: raw events reduce map-side to
    // one row per (type, bucket) FIRST — only the bucket series
    // (bounded by time range / step, not by corpus size) flows
    // through the per-type neighbor windows. The spine endpoints are
    // observed buckets by construction, so every gap is interior and
    // the interpolation is total. Integer µs bucket arithmetic (div),
    // decimal-exact means, one rounded IEEE interpolation expression.
    QueryDef("d13_interpolate",
      (s, dir) => {
        val step = 600000000L // 10 min in µs
        // Persisted: the bucket frame feeds BOTH the spine bounds and
        // the spine join — unpersisted, each consumer would re-run the
        // raw-events aggregation (two corpus scans for one query).
        val obs = graft.operators.TrackedCache.persist(
          ev(s, dir)
            .groupBy(col("event_type"),
              expr(s"(unix_micros(ts) div $step) * $step").as("m"))
            .agg((sum(col("value").cast("decimal(18,2)")).cast("double") /
              count(lit(1))).as("v")))
        val bounds = obs.groupBy("event_type")
          .agg(min("m").as("lo"), max("m").as("hi"))
        val spine = bounds.select(col("event_type"),
          explode(sequence(col("lo"), col("hi"), lit(step))).as("m"))
        val w = Window.partitionBy("event_type").orderBy("m")
        val prev = last(
          when(col("v").isNotNull, struct(col("m").as("pm"), col("v").as("pv"))),
          ignoreNulls = true).over(w.rowsBetween(Window.unboundedPreceding, -1))
        // "nearest FOLLOWING observation" spelled as a PRECEDING frame
        // over the descending order: Spark evaluates an
        // UnboundedFollowing frame by rescanning to the partition end
        // for every row — O(n²) per key (measured 6 s on a 4k-bucket
        // spine); the growing-frame form is incremental O(n).
        val wDesc = Window.partitionBy("event_type").orderBy(col("m").desc)
        val next = last(
          when(col("v").isNotNull, struct(col("m").as("nm"), col("v").as("nv"))),
          ignoreNulls = true).over(wDesc.rowsBetween(Window.unboundedPreceding, -1))
        val j = spine.join(obs, Seq("event_type", "m"), "left")
          .withColumn("p", prev).withColumn("nx", next)
        val frac = (col("m") - col("p.pm")).cast("double") /
          (col("nx.nm") - col("p.pm"))
        // No round(): every term is plain IEEE arithmetic on inputs
        // already bit-identical across engines (decimal-exact means,
        // integer µs), and rounding an AVERAGE would itself break
        // parity — decimal-sum/2^k counts produce genuine ties at the
        // rounding digit, which Spark (exact decimal half-up) and
        // DuckDB (scaled-double) resolve differently.
        val interp = col("p.pv") + (col("nx.nv") - col("p.pv")) * frac
        j.select(col("event_type"), col("m").as("bucket_us"),
            when(col("v").isNotNull, col("v")).otherwise(interp)
              .as("v_filled"),
            when(col("v").isNotNull, lit("obs")).otherwise(lit("interp")).as("src"))
          .orderBy("event_type", "bucket_us")
      },
      Some("""WITH obs AS (
          SELECT event_type,
            (epoch_us(CAST(ts AS TIMESTAMP)) // 600000000) * 600000000 AS m,
            CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS v
          FROM events GROUP BY 1, 2),
        bounds AS (SELECT event_type, min(m) AS lo, max(m) AS hi FROM obs GROUP BY event_type),
        spine AS (SELECT event_type, unnest(generate_series(lo, hi, 600000000)) AS m FROM bounds),
        j AS (SELECT s.event_type, s.m, o.v
              FROM spine s LEFT JOIN obs o ON o.event_type = s.event_type AND o.m = s.m),
        pn AS (
          SELECT event_type, m, v,
            last_value(CASE WHEN v IS NOT NULL THEN {'pm': m, 'pv': v} END IGNORE NULLS)
              OVER (PARTITION BY event_type ORDER BY m
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS p,
            first_value(CASE WHEN v IS NOT NULL THEN {'nm': m, 'nv': v} END IGNORE NULLS)
              OVER (PARTITION BY event_type ORDER BY m
                    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nx
          FROM j)
        SELECT event_type, m AS bucket_us,
          CASE WHEN v IS NOT NULL THEN v
               ELSE struct_extract(p, 'pv') +
                 (struct_extract(nx, 'nv') - struct_extract(p, 'pv')) *
                 (CAST(m - struct_extract(p, 'pm') AS DOUBLE) /
                  (struct_extract(nx, 'nm') - struct_extract(p, 'pm')))
          END AS v_filled,
          CASE WHEN v IS NOT NULL THEN 'obs' ELSE 'interp' END AS src
        FROM pn ORDER BY event_type, bucket_us""")),

    // D14: LTTB-style downsampling (largest-triangle-three-buckets —
    // the Grafana/CH `lttb` dashboard decimation): one representative
    // point per hour bucket, the one subtending the largest triangle
    // against the NEIGHBOR BUCKET AVERAGES. Classic LTTB anchors on
    // the previously *selected* point — a sequential chain no engine
    // parallelizes — so this uses the standard parallel variant
    // (fixed bucket-average anchors), which keeps selection
    // embarrassingly parallel per bucket. First/last buckets keep
    // their first/last points, as in LTTB. All triangle areas are
    // EXACT integers: x rebased to µs-since-2024 and y in cents,
    // anchor rationals cleared by n1²·n3 (decimal(38,0) here ≡
    // HUGEINT in the oracle), so the argmax can't be flipped by a
    // float ulp. Scale: one bucket aggregation (map-side combined),
    // anchor lag/lead over the tiny bucket series, one rank window
    // pruned by WindowGroupLimit.
    QueryDef("d14_lttb_downsample",
      (s, dir) => {
        val step = 3600000000L          // 1 h buckets, µs
        val base = 1704067200000000L    // 2024-01-01 in µs
        val D = "decimal(38,0)"
        def dc(c: org.apache.spark.sql.Column) = c.cast(D)
        val pts = graft.operators.TrackedCache.persist(
          ev(s, dir).select(col("event_type"),
              (unix_micros(col("ts")) - base).as("x"),
              (col("value").cast("decimal(18,2)") * 100).cast("bigint").as("yc"),
              col("value"), col("event_id"))
            .withColumn("b", expr(s"x div $step")))
        val ba = pts.groupBy("event_type", "b")
          .agg(sum(col("x")).as("sx"), sum(col("yc")).as("sy"),
            count(lit(1)).as("n"))
        val aw = Window.partitionBy("event_type").orderBy("b")
        val anch = ba
          .withColumn("sx1", lag("sx", 1).over(aw))
          .withColumn("sy1", lag("sy", 1).over(aw))
          .withColumn("n1", lag("n", 1).over(aw))
          .withColumn("sx3", lead("sx", 1).over(aw))
          .withColumn("sy3", lead("sy", 1).over(aw))
          .withColumn("n3", lead("n", 1).over(aw))
        val t1 = (dc(col("sx1")) * dc(col("n3")) - dc(col("sx3")) * dc(col("n1"))) *
          (dc(col("yc")) * dc(col("n1")) - dc(col("sy1")))
        val t2 = (dc(col("sx1")) - dc(col("x")) * dc(col("n1"))) *
          (dc(col("sy3")) * dc(col("n1")) - dc(col("sy1")) * dc(col("n3")))
        val key = when(col("n1").isNull, dc(col("x")))
          .when(col("n3").isNull, dc(-col("x")))
          .otherwise(-abs(t1 - t2))
        val pw = Window.partitionBy("event_type", "b")
          .orderBy(key.asc, col("x").asc, col("event_id").asc)
        pts.join(anch, Seq("event_type", "b"))
          .withColumn("rn", row_number().over(pw))
          .filter(col("rn") === 1)
          .select(col("event_type"), col("b").as("bucket"),
            (col("x") + base).as("ts_us"), col("value"), col("n"))
          .orderBy("event_type", "bucket")
      },
      Some("""WITH pts AS (
          SELECT event_type,
            epoch_us(CAST(ts AS TIMESTAMP)) - 1704067200000000 AS x,
            CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS yc,
            value, event_id,
            (epoch_us(CAST(ts AS TIMESTAMP)) - 1704067200000000) // 3600000000 AS b
          FROM events),
        ba AS (SELECT event_type, b, SUM(x) AS sx, SUM(yc) AS sy, COUNT(*) AS n
               FROM pts GROUP BY 1, 2),
        anch AS (SELECT event_type, b, n,
            lag(sx) OVER w AS sx1, lag(sy) OVER w AS sy1, lag(n) OVER w AS n1,
            lead(sx) OVER w AS sx3, lead(sy) OVER w AS sy3, lead(n) OVER w AS n3
          FROM ba WINDOW w AS (PARTITION BY event_type ORDER BY b)),
        j AS (SELECT p.event_type, p.b, p.x, p.yc, p.value, p.event_id,
                a.n, a.sx1, a.sy1, a.n1, a.sx3, a.sy3, a.n3
              FROM pts p JOIN anch a USING (event_type, b)),
        sc AS (SELECT *,
            (CAST(sx1 AS HUGEINT) * CAST(n3 AS HUGEINT) - CAST(sx3 AS HUGEINT) * CAST(n1 AS HUGEINT)) *
              (CAST(yc AS HUGEINT) * CAST(n1 AS HUGEINT) - CAST(sy1 AS HUGEINT))
            - (CAST(sx1 AS HUGEINT) - CAST(x AS HUGEINT) * CAST(n1 AS HUGEINT)) *
              (CAST(sy3 AS HUGEINT) * CAST(n1 AS HUGEINT) - CAST(sy1 AS HUGEINT) * CAST(n3 AS HUGEINT)) AS t
          FROM j),
        pick AS (SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY event_type, b ORDER BY
                CASE WHEN n1 IS NULL THEN CAST(x AS HUGEINT)
                     WHEN n3 IS NULL THEN -CAST(x AS HUGEINT)
                     ELSE -abs(t) END,
                x, event_id) AS rn
            FROM sc) z
          WHERE rn = 1)
        SELECT event_type, b AS bucket, x + 1704067200000000 AS ts_us, value, n
        FROM pick ORDER BY event_type, bucket""")),

    // B5: deterministic hash sampling (CH `SAMPLE` clause analog —
    // stable 1-in-10 of users, not rows, so per-user analyses stay
    // coherent).
    QueryDef("b5_hash_sample",
      (s, dir) => ev(s, dir)
        .filter(HashFunctions.md5prefix64(col("user_id").cast("string")) % 10 === 0)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
        .orderBy("event_type"),
      Some("""SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
        FROM events
        WHERE ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 10 = 0
        GROUP BY event_type ORDER BY event_type""")),

    // E20: funnel analysis (CH windowFunnel analog): signup → click →
    // purchase, each stage strictly after the previous; staged
    // aggregations joined on the key (3 small shuffles, no windows).
    QueryDef("e20_funnel",
      (s, dir) => {
        val e = ev(s, dir).withColumn("ts_us", unix_micros(col("ts")))
        val s1 = e.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min(col("ts_us")).as("t1"))
        val s2 = e.filter(col("event_type") === "click")
          .join(s1, "user_id").filter(col("ts_us") > col("t1"))
          .groupBy("user_id").agg(min(col("ts_us")).as("t2"))
        val s3 = e.filter(col("event_type") === "purchase")
          .join(s2, "user_id").filter(col("ts_us") > col("t2"))
          .groupBy("user_id").agg(min(col("ts_us")).as("t3"))
        val users = e.select("user_id").distinct()
        users.join(s1, Seq("user_id"), "left")
          .join(s2, Seq("user_id"), "left")
          .join(s3, Seq("user_id"), "left")
          .select(col("user_id"),
            when(col("t3").isNotNull, 3).when(col("t2").isNotNull, 2)
              .when(col("t1").isNotNull, 1).otherwise(0).as("funnel_depth"))
          .groupBy("funnel_depth").agg(count(lit(1)).as("n_users"))
          .orderBy("funnel_depth")
      },
      Some("""WITH e AS (SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        s1 AS (SELECT user_id, min(ts_us) AS t1 FROM e WHERE event_type = 'signup' GROUP BY user_id),
        s2 AS (SELECT e.user_id, min(ts_us) AS t2 FROM e JOIN s1 USING (user_id)
               WHERE event_type = 'click' AND ts_us > t1 GROUP BY e.user_id),
        s3 AS (SELECT e.user_id, min(ts_us) AS t3 FROM e JOIN s2 USING (user_id)
               WHERE event_type = 'purchase' AND ts_us > t2 GROUP BY e.user_id),
        u AS (SELECT DISTINCT user_id FROM e)
        SELECT CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
                    WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS funnel_depth,
          COUNT(*) AS n_users
        FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
        GROUP BY 1 ORDER BY funnel_depth""")),

    // E20b: windowed funnel (CH windowFunnel(window)(ts, c1, c2, c3)):
    // the deepest signup→click→purchase chain whose LAST step falls
    // within `W` of the chain's FIRST step. Unlike e20, the chain may
    // start at ANY signup, not just the earliest — for a fixed start
    // the greedy earliest-next-step chain minimizes the end time, so
    // checking every start × greedy chain is exact. Scale shape: the
    // per-step joins are hash joins on user_id with the time bounds as
    // residual filters; per-(user, start) minima aggregate with
    // map-side combine, so work is Σ per-user signups × step events,
    // never a cross join.
    QueryDef("e20b_window_funnel",
      (s, dir) => {
        val W = 6L * 3600L * 1000000L // 6 h in µs
        val e = ev(s, dir).withColumn("ts_us", unix_micros(col("ts")))
        val depths = graft.operators.Funnels.windowFunnelDepth(
          e, "user_id", "ts_us", "event_type",
          Seq("signup", "click", "purchase"), W)
        e.select("user_id").distinct()
          .join(depths, Seq("user_id"), "left")
          .select(col("user_id"), coalesce(col("depth"), lit(0)).as("depth"))
          .groupBy("depth").agg(count(lit(1)).as("n_users"))
          .orderBy("depth")
      },
      Some("""WITH e AS (SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        starts AS (SELECT user_id, ts_us AS t1 FROM e WHERE event_type = 'signup'),
        s2 AS (SELECT e.user_id, t1, min(ts_us) AS t2 FROM e JOIN starts USING (user_id)
               WHERE event_type = 'click' AND ts_us > t1
                 AND ts_us <= t1 + 21600000000 GROUP BY e.user_id, t1),
        s3 AS (SELECT e.user_id, t1, min(ts_us) AS t3 FROM e JOIN s2 USING (user_id)
               WHERE event_type = 'purchase' AND ts_us > t2
                 AND ts_us <= t1 + 21600000000 GROUP BY e.user_id, t1),
        d AS (SELECT starts.user_id,
                max(CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
                         ELSE 1 END) AS depth
              FROM starts LEFT JOIN s2 USING (user_id, t1) LEFT JOIN s3 USING (user_id, t1)
              GROUP BY starts.user_id),
        u AS (SELECT DISTINCT user_id FROM e)
        SELECT COALESCE(depth, 0) AS depth, COUNT(*) AS n_users
        FROM u LEFT JOIN d USING (user_id)
        GROUP BY 1 ORDER BY depth""")),

    // E21: fixed-width histogram (CH histogram analog).
    QueryDef("e21_histogram",
      (s, dir) => ev(s, dir)
        .groupBy(floor(col("value") / 50.0).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"),
          QueryDefs.dsum(col("value")).as("sum_value"))
        .orderBy("bucket"),
      Some(s"""SELECT CAST(floor(value / 50.0) AS BIGINT) AS bucket, COUNT(*) AS n,
        ${QueryDefs.sqlDsum("value")} AS sum_value
        FROM events GROUP BY 1 ORDER BY bucket""")),

    // D9: cohort retention (CH `retention` analog): users grouped by
    // first-seen week, counted per weeks-since-cohort offset.
    QueryDef("d9_retention",
      (s, dir) => {
        val e = ev(s, dir)
        val firsts = e.groupBy("user_id")
          .agg(date_trunc("week", min(col("ts"))).as("cohort"))
        val active = e.select(col("user_id"),
          date_trunc("week", col("ts")).as("wk")).distinct()
        active.join(firsts, "user_id")
          .withColumn("k", (datediff(col("wk"), col("cohort")) / 7).cast("int"))
          .groupBy(unix_micros(col("cohort")).as("cohort_us"), col("k"))
          .agg(countDistinct(col("user_id")).as("n_users"))
          .orderBy("cohort_us", "k")
      },
      Some("""WITH firsts AS (
          SELECT user_id, date_trunc('week', CAST(min(ts) AS TIMESTAMP)) AS cohort
          FROM events GROUP BY user_id),
        active AS (
          SELECT DISTINCT user_id, date_trunc('week', CAST(ts AS TIMESTAMP)) AS wk
          FROM events)
        SELECT epoch_us(cohort) AS cohort_us,
          CAST(date_diff('day', cohort, wk) // 7 AS INT) AS k,
          COUNT(DISTINCT user_id) AS n_users
        FROM active JOIN firsts USING (user_id)
        GROUP BY 1, 2 ORDER BY cohort_us, k""")),

    // E22: pivot (CH pivot-style conditional matrix via Spark .pivot).
    QueryDef("e22_pivot",
      (s, dir) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val p = ev(s, dir).groupBy("user_id")
          .pivot("event_type", types).agg(count(lit(1)))
        p.select(col("user_id") +: types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
          .orderBy("user_id")
      },
      Some("""SELECT user_id,
          COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
          COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
          COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
          COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
          COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
        FROM events GROUP BY user_id ORDER BY user_id""")),

    // D10: deterministic per-group sampling — bottom-k by key hash
    // (min-wise sampling). Unlike rand() samples this is reproducible
    // across engines/runs and stable under re-partitioning, which is
    // what a training-data pipeline needs for audit samples.
    QueryDef("d10_group_sample",
      (s, dir) => {
        val w = Window.partitionBy(col("event_type"))
          .orderBy(HashFunctions.md5prefix64(col("event_id").cast("string")), col("event_id"))
        ev(s, dir)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select("event_type", "rn", "event_id", "value")
          .orderBy("event_type", "rn")
      },
      Some("""SELECT event_type, rn, event_id, value FROM (
          SELECT event_type, event_id, value,
            row_number() OVER (PARTITION BY event_type
              ORDER BY ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT, event_id) AS rn
          FROM events) t
        WHERE rn <= 5 ORDER BY event_type, rn""")),

    // E23: CH sequenceMatch('(?1).*(?2).*(?3)') — per user, does
    // signup → click → purchase occur strictly in order? Same staged
    // min-timestamp composition as the funnel (three key-shuffled
    // aggregations, no per-user event sorting).
    QueryDef("e23_sequence_match",
      (s, dir) => {
        val e = ev(s, dir).withColumn("ts_us", unix_micros(col("ts")))
        val s1 = e.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min(col("ts_us")).as("t1"))
        val s2 = e.filter(col("event_type") === "click")
          .join(s1, "user_id").filter(col("ts_us") > col("t1"))
          .groupBy("user_id").agg(min(col("ts_us")).as("t2"))
        val s3 = e.filter(col("event_type") === "purchase")
          .join(s2, "user_id").filter(col("ts_us") > col("t2"))
          .groupBy("user_id").agg(min(col("ts_us")).as("t3"))
        e.select("user_id").distinct()
          .join(s3, Seq("user_id"), "left")
          .select(col("user_id"), col("t3").isNotNull.as("matched"))
          .orderBy("user_id")
      },
      Some("""WITH e AS (SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        s1 AS (SELECT user_id, min(ts_us) AS t1 FROM e WHERE event_type = 'signup' GROUP BY user_id),
        s2 AS (SELECT e.user_id, min(ts_us) AS t2 FROM e JOIN s1 USING (user_id)
               WHERE event_type = 'click' AND ts_us > t1 GROUP BY e.user_id),
        s3 AS (SELECT e.user_id, min(ts_us) AS t3 FROM e JOIN s2 USING (user_id)
               WHERE event_type = 'purchase' AND ts_us > t2 GROUP BY e.user_id)
        SELECT u.user_id, t3 IS NOT NULL AS matched
        FROM (SELECT DISTINCT user_id FROM e) u LEFT JOIN s3 USING (user_id)
        ORDER BY user_id""")),

    // E24: CH groupUniqArray — distinct set per key, emitted sorted
    // so the result is deterministic across engines.
    QueryDef("e24_group_uniq_array",
      (s, dir) => ev(s, dir)
        .groupBy("user_id")
        .agg(concat_ws(",", array_sort(collect_set(col("event_type")))).as("types"))
        .orderBy("user_id"),
      Some("""SELECT user_id,
          array_to_string(list(DISTINCT event_type ORDER BY event_type), ',') AS types
        FROM events GROUP BY user_id ORDER BY user_id""")),

    // E19: ordered array aggregation (CH groupArray): first 5 event
    // values (as cents) per user in time order. Rows are pruned to
    // the first 5 per user with a rank BEFORE collect_list — a plain
    // collect-then-slice accumulates a hot user's ENTIRE history in
    // the aggregation buffer (unbounded per-key state at 100 TB);
    // the window version ships at most 5 rows per key into the
    // aggregation, and WindowGroupLimit stops the rank scan early.
    QueryDef("e19_group_array",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        ev(s, dir)
          .withColumn("cents", round(col("value") * 100).cast("long"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .groupBy("user_id")
          .agg(concat_ws(",", transform(
            sort_array(collect_list(struct(unix_micros(col("ts")).as("t"),
              col("event_id").as("e"), col("cents").as("c")))),
            x => x.getField("c").cast("string"))).as("first5_cents"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id,
          array_to_string((list(CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR)
            ORDER BY ts, event_id))[1:5], ',') AS first5_cents
        FROM events GROUP BY user_id ORDER BY user_id"""))
  )
}
