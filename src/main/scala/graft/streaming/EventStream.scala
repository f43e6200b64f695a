package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession, functions => F}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface for the `events` stream table.
  *
  * The reference is pure batch (SURVEY §2.9 — its "streaming" is
  * bounded-memory incremental processing of static files), so nothing here is
  * needed for chilon parity; this module exists because a training-data
  * pipeline at 100 TB ingests continuously. Both jobs are expressed so the
  * identical code runs on a Kafka source in production:
  *
  *   - watermarked sliding-window aggregation (event-time, late data dropped
  *     after 10 minutes);
  *   - custom sessionization state machine via `flatMapGroupsWithState`.
  */
object EventStream {

  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)
  ))

  /** Event-time windowed counts with a watermark. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(F.window(F.col("ts"), "1 hour"), F.col("event_type"))
      .agg(F.count(F.lit(1)).as("n"), F.round(F.sum("value"), 4).as("total_value"))
      .select(F.col("window.start").as("win_start"), F.col("event_type"), F.col("n"),
        F.col("total_value"))

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class SessionState(start: Long, last: Long, n: Int, value: Double)
  final case class SessionOut(user_id: Long, n_events: Int, duration_sec: Long, value: Double)

  private val SessionGapMs = 30 * 60 * 1000L

  /** Custom state machine: gap-based sessions per user (30-minute gap).
    *
    * The event-time timeout is ARMED (`setTimeoutTimestamp(last + gap)`): when
    * the watermark passes a user's last event + gap, the group is invoked with
    * `hasTimedOut`, the buffered session is emitted, and the state is removed
    * — otherwise each user's final session would never flush and per-user
    * state would grow forever. In a streaming run the source MUST carry a
    * watermark (`events.withWatermark("ts", ...)`) for EventTimeTimeout to
    * fire; in a batch run timeouts never fire (Spark semantics) and the
    * trailing session is intentionally still open.
    */
  def sessionize(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId, s.n, (s.last - s.start) / 1000, s.value))
          } else {
            val out = Vector.newBuilder[SessionOut]
            var cur = state.getOption
            it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last > SessionGapMs =>
                  out += SessionOut(userId, s.n, (s.last - s.start) / 1000, s.value)
                  cur = Some(SessionState(t, t, 1, e.value))
                case Some(s) =>
                  cur = Some(SessionState(s.start, t, s.n + 1, s.value + e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // Arm the flush timeout. Must be strictly beyond the current
              // watermark or Spark rejects it. In a BATCH run there is no
              // watermark attribute (getCurrentWatermarkMs throws) and
              // timeouts never fire anyway — skip arming, the trailing
              // session is intentionally still open there.
              try state.setTimeoutTimestamp(
                math.max(state.getCurrentWatermarkMs() + 1, s.last + SessionGapMs))
              catch { case _: UnsupportedOperationException => }
            }
            out.result().iterator
          }
        })
  }

  /** Watermarked stream-stream INNER join — purchase-to-signup attribution
    * (the impression/click shape): each purchase joins every signup of the
    * same user whose timestamp precedes it by at most `window`.
    *
    * Production shape: two Kafka topics, both watermarked; the time-range
    * condition `p.ts BETWEEN s.ts AND s.ts + window` lets Spark derive state
    * eviction for BOTH sides (a signup is dropped from state once the
    * purchase-side watermark passes `s.ts + window + delay`), so join state
    * is bounded by event-time skew, never by stream length. Inner joins
    * support Append mode: each matching pair is emitted exactly once.
    *
    * The same code runs batch (watermarks ignored) — StreamingSpec pins the
    * drained stream result equal to the batch run, and the driver oracle
    * (q_stream_join) replays the join relationally in DuckDB.
    */
  def attributionJoin(
      signups: DataFrame,
      purchases: DataFrame,
      delay: String = "1 hour",
      window: String = "1 hour"
  ): DataFrame = {
    val s = signups.withWatermark("ts", delay).alias("s")
    val p = purchases.withWatermark("ts", delay).alias("p")
    s.join(p,
        F.col("p.user_id") === F.col("s.user_id") &&
          F.col("p.ts") >= F.col("s.ts") &&
          F.col("p.ts") <= F.col("s.ts") + F.expr(s"INTERVAL $window"))
      .select(
        F.col("s.user_id").as("user_id"),
        F.col("s.event_id").as("signup_event_id"),
        F.col("p.event_id").as("purchase_event_id"),
        F.col("p.value").as("purchase_value"))
  }

  /** Drive [[attributionJoin]] as a genuine two-source stream over a staged
    * parquet directory into a memory sink, `Trigger.AvailableNow` in
    * `maxFilesPerTrigger`-file micro-batches. The watermark delay is sized
    * past the staged corpus's event-time span, so no state evicts mid-drain
    * and the drained result is the complete batch join (which is what the
    * driver's DuckDB oracle checks).
    */
  def startMemoryAttribution(
      spark: SparkSession,
      stageDir: String,
      queryName: String,
      maxFilesPerTrigger: Int,
      delay: String = "4000 days"
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    def src() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(stageDir)
    val joined = attributionJoin(
      src().filter(F.col("event_type") === "signup"),
      src().filter(F.col("event_type") === "purchase"),
      delay = delay)
    joined.writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName(queryName)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
  }

  /** Drive Spark's NATIVE `session_window` merging aggregation as a genuine
    * stream over a staged parquet directory into a memory sink — the
    * stateful-aggregation surface [[sessionize]]'s hand-rolled state machine
    * does not exercise (built-in session merge, state-store-backed, the
    * exact code a Kafka-sourced production job runs). Complete output mode:
    * every micro-batch re-emits the merged-so-far sessions, so the drained
    * table is the final merged session set with NO watermark dependency —
    * sessions spanning micro-batch boundaries MUST merge through the state
    * store or the result diverges from the batch run (which is what the
    * driver's oracle — the same SQL as q_session_window — checks).
    */
  def startMemorySessionWindows(
      spark: SparkSession,
      stageDir: String,
      queryName: String,
      maxFilesPerTrigger: Int
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(stageDir)
    src
      .groupBy(F.col("user_id"), F.session_window(F.col("ts"), "30 minutes"))
      .agg(F.count(F.lit(1)).as("n_events"),
        F.sum(F.round(F.col("value") * 1e6).cast("long")).as("value_micro"))
      .select(F.col("user_id"),
        F.col("session_window.start").as("session_start"),
        F.col("session_window.end").as("session_end"),
        F.col("n_events"), F.col("value_micro"))
      .writeStream
      .outputMode(OutputMode.Complete)
      .format("memory")
      .queryName(queryName)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
  }

  /** Hopping (sliding) window aggregation as a genuine stream: every event
    * lands in windowDuration/slideDuration overlapping windows (4 here),
    * the one window class [[windowedCounts]] (tumbling) and
    * [[startMemorySessionWindows]] (session) do not cover. Complete output
    * mode re-emits the merged-so-far counts each micro-batch, so events of
    * one window arriving in different micro-batches MUST combine through
    * the state store to match the batch run — the driver's oracle (the
    * same SQL as the batch twin) checks exactly that.
    *
    * Scale shape: state is |windows in horizon| × |event_type| rows —
    * watermarking bounds the horizon in a production continuous run; the
    * overlap factor multiplies shuffle rows by w/s, which is why slide
    * ratios are kept small (4 here).
    */
  def startMemoryHopping(
      spark: SparkSession,
      stageDir: String,
      queryName: String,
      maxFilesPerTrigger: Int
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(stageDir)
    src
      .groupBy(F.window(F.col("ts"), "60 minutes", "15 minutes"),
        F.col("event_type"))
      .agg(F.count(F.lit(1)).as("n_events"), F.sum("user_id").as("user_sum"))
      .select(F.col("window.start").as("wstart"),
        F.col("window.end").as("wend"),
        F.col("event_type"), F.col("n_events"), F.col("user_sum"))
      .writeStream
      .outputMode(OutputMode.Complete)
      .format("memory")
      .queryName(queryName)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
  }

  /** Watermarked tumbling-window aggregation in APPEND mode — the
    * production late-data semantics the Complete-mode drains deliberately
    * sidestep: rows whose window was already finalized are DROPPED (the
    * state store never re-opens), and a window is emitted exactly once,
    * when the event-time watermark passes its end. Both effects are
    * deterministic under a controlled file→micro-batch schedule, which is
    * what makes this oracle-able: Spark's two-watermark rule (pinned by
    * WatermarkProbeMain) is
    *   wmEvict(k) = max(event-time ms over batches 0..k-1) − delay,
    *   late-filter of batch k uses wmEvict(k-1),
    *   a window emits/evicts when window.end ≤ wmEvict (ms-floored),
    *   and AvailableNow appends ONE no-data flush batch iff the last data
    *   batch advanced the watermark (eager state eviction, default
    *   `noDataMicroBatches.enabled`) — so the final emission horizon is
    *   the GLOBAL event-time max minus the delay.
    * State is bounded by the watermark horizon — the property that lets
    * this run forever at 10^12 events/day where an unwatermarked
    * aggregation would accrete state without bound.
    */
  def startMemoryLateWindows(
      spark: SparkSession,
      stageDir: String,
      queryName: String,
      maxFilesPerTrigger: Int
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(stageDir)
    src.withWatermark("ts", "10 minutes")
      .groupBy(F.window(F.col("ts"), "10 minutes"), F.col("event_type"))
      .agg(F.count(F.lit(1)).as("n_events"), F.sum("user_id").as("user_sum"))
      .select(F.col("window.start").as("wstart"),
        F.col("window.end").as("wend"),
        F.col("event_type"), F.col("n_events"), F.col("user_sum"))
      .writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName(queryName)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
  }

  /** Arbitrary-stateful streaming via `flatMapGroupsWithState` — the
    * custom-state API a production job reaches for when built-in
    * aggregations can't express the semantics, driven so its per-batch
    * emissions are ORACLE-ABLE: per user, the state is (event count,
    * distinct-type bitmask); each micro-batch in which a user has input
    * emits one row with the cumulative count and distinct-type count
    * AFTER that batch. Both state folds are commutative, so the emission
    * is independent of intra-batch row order — only the deterministic
    * file→batch schedule matters, and the oracle replays it with running
    * sums and first-seen-batch joins. Append mode, no timeout (state
    * lifetime bounded by the fixture; [[sessionize]] demonstrates
    * event-time timeouts).
    */
  final case class UserState(nEvents: Long, typeMask: Int)

  private val TypeBits = Map("click" -> 0, "error" -> 1, "purchase" -> 2,
    "signup" -> 3, "view" -> 4)

  def startMemoryUserState(
      spark: SparkSession,
      stageDir: String,
      queryName: String,
      maxFilesPerTrigger: Int
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(stageDir)
    src
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[Event], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0))
          var n = prev.nEvents
          var mask = prev.typeMask
          rows.foreach { e =>
            n += 1
            mask |= (1 << TypeBits.getOrElse(e.event_type, 30))
          }
          state.update(UserState(n, mask))
          Iterator((uid, n, Integer.bitCount(mask).toLong))
      }
      .toDF("user_id", "n_events", "n_types")
      .writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName(queryName)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
  }

  /** Update-mode hourly window counts — each micro-batch emits only the
    * groups it changed, with their cumulative aggregates (the incremental
    * dashboard/changelog shape; a KV upsert sink consumes exactly this).
    * The memory sink appends every batch's updated rows, making the full
    * update history observable and, under a deterministic file schedule,
    * oracle-able. No watermark: state lives forever (bounded here by the
    * fixture horizon; production bounds it with a watermark — that
    * semantics is [[startMemoryLateWindows]]'s subject).
    */
  def startMemoryUpdateWindows(
      spark: SparkSession,
      stageDir: String,
      queryName: String,
      maxFilesPerTrigger: Int
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(stageDir)
    src
      .groupBy(F.window(F.col("ts"), "1 hour"), F.col("event_type"))
      .agg(F.count(F.lit(1)).as("n_events"), F.sum("user_id").as("user_sum"))
      .select(F.col("window.start").as("wstart"),
        F.col("window.end").as("wend"),
        F.col("event_type"), F.col("n_events"), F.col("user_sum"))
      .writeStream
      .outputMode(OutputMode.Update)
      .format("memory")
      .queryName(queryName)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
  }

  /** Stream-static enrichment — the production shape of dimension lookup on
    * a live stream (clickstream × customer table, crawl stream × domain
    * policy table): the static side is a plain batch DataFrame re-resolved
    * per micro-batch and explicitly broadcast, so each micro-batch plans a
    * map-side hash join (the stream never shuffles on the join key and the
    * join adds NO state store — only the downstream Complete-mode
    * aggregation is stateful). This is the one streaming join class
    * [[attributionJoin]] (stream-stream) does not cover.
    *
    * Scale shape: the dimension is vocabulary-sized (customers, hosts,
    * policies — never corpus-sized) and rides the broadcast; per-batch
    * aggregation state is |dim attr| × |event_type| rows. At 10^12
    * events/day the stream side stays a pure pipelined scan→join→partial-agg
    * per micro-batch.
    */
  def startMemoryEnriched(
      spark: SparkSession,
      stageDir: String,
      dim: DataFrame,
      dimKeyCol: String,
      dimAttrCol: String,
      queryName: String,
      maxFilesPerTrigger: Int
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(stageDir)
    val d = dim.select(F.col(dimKeyCol).cast("long").as("dim_key"),
      F.col(dimAttrCol).as("segment"))
    src
      .join(F.broadcast(d), src("user_id") === F.col("dim_key"))
      .groupBy(F.col("segment"), F.col("event_type"))
      .agg(F.count(F.lit(1)).as("n_events"),
        F.sum(F.round(F.col("value") * 1e6).cast("long")).as("value_micro"))
      .writeStream
      .outputMode(OutputMode.Complete)
      .format("memory")
      .queryName(queryName)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
  }

  /** Batch-driven smoke: replay the parquet events table through the
    * streaming window aggregation via an in-memory sink.
    */
  def replayWindowed(spark: SparkSession, sfDir: String, queryName: String): DataFrame = {
    val stream = spark.readStream.schema(schema).parquet(s"$sfDir")
    val q = windowedCounts(stream).writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
