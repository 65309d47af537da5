package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral-sequence aggregates from the reference engine's family
  * (ClickHouse's `windowFunnel` / `retention` surface — the reference's
  * summaries live in that engine, and a user switching from it expects
  * these): funnel-stage progression and cohort retention, both expressed
  * as chained equi-joins + aggregations so every timestamp comparison is
  * exact integer microseconds and the whole computation replays in SQL.
  *
  * Scale shape: everything is keyed by user — per-step joins are
  * co-partitioned shuffles on the user key (AQE handles skewed users),
  * per-stage reductions are hash aggregations with map-side combine. No
  * window sorts, no per-user collected arrays: state per user is one row
  * per surviving (anchor, stage) pair, bounded by that user's step-1
  * event count.
  */
object Funnel {

  /** `windowFunnel`: for each user, the deepest step k of `steps` reachable
    * as a strictly-increasing event chain `t1 < t2 < … < tk ≤ t1 + windowUs`
    * anchored at ANY step-1 occurrence. Greedy minimal continuation per
    * anchor is exhaustive: for a fixed anchor t1, taking the earliest valid
    * t_{i+1} only widens every later stage's window, so a user reaches
    * stage k iff some anchor survives k−1 greedy extensions. Returns
    * `(user, level)` — level 0 rows cover users with events but no step-1.
    *
    * `tsUsCol` must be integer microseconds (exact arithmetic — never
    * engine-divergent interval types). */
  def windowFunnel(events: DataFrame, userCol: String, tsUsCol: String,
      typeCol: String, steps: Seq[String], windowUs: Long): DataFrame = {
    require(steps.nonEmpty)
    val byType = steps.map(t =>
      events.filter(col(typeCol) === t)
        .select(col(userCol).as("user"), col(tsUsCol).as("t")))

    // stage k frame: (user, t1, tk) — anchors still alive after k-1 extensions
    val s1 = byType.head.select(col("user"), col("t").as("t1"), col("t").as("tk"))
    val stages = byType.tail.scanLeft(s1) { (cur, ek) =>
      cur.join(ek, "user")
        .filter(col("t") > col("tk") && col("t") <= col("t1") + lit(windowUs))
        .groupBy("user", "t1")
        .agg(min(col("t")).as("tk"))
    }

    val levels = events.select(col(userCol).as("user")).distinct()
      .select(col("user"), lit(0).as("level")) +:
      stages.zipWithIndex.map { case (s, i) =>
        s.select(col("user")).distinct().select(col("user"), lit(i + 1).as("level"))
      }
    levels.reduce(_.union(_)).groupBy("user").agg(max("level").as("level"))
  }

  /** `sequenceMatch`: 1 for each user with events matching the condition
    * chain `conds = (type, maxGapUs)` — event i+1 strictly after event i
    * and, when `maxGapUs` is set, within that gap OF THE PREVIOUS MATCHED
    * EVENT (the head's gap is ignored). Per-gap bounds break windowFunnel's
    * greedy argument — an earlier stage-k match can strand a later stage
    * whose window a later match would reach — so each stage carries the
    * FULL feasible set of last-match times, not the minimum: stage k =
    * distinct (user, t) with t a type-k event reachable from SOME feasible
    * stage-(k−1) time. Exact, still relational; stage size is bounded by
    * the user's event count of that type. Returns `(user, matched)` over
    * all users. */
  def sequenceMatch(events: DataFrame, userCol: String, tsUsCol: String,
      typeCol: String, conds: Seq[(String, Option[Long])]): DataFrame = {
    require(conds.nonEmpty)
    val byType = conds.map { case (t, _) =>
      events.filter(col(typeCol) === t)
        .select(col(userCol).as("user"), col(tsUsCol).as("t"))
    }
    val s1 = byType.head.distinct()
    val last = byType.tail.zip(conds.tail.map(_._2)).foldLeft(s1) {
      case (cur, (ek, gap)) =>
        val prev = cur.select(col("user"), col("t").as("tp"))
        val bound = gap.fold(lit(true))(g => col("t") <= col("tp") + lit(g))
        ek.join(prev, "user").filter(col("t") > col("tp") && bound)
          .select("user", "t").distinct()
    }
    events.select(col(userCol).as("user")).distinct()
      .join(last.select(col("user")).distinct().withColumn("m", lit(1)),
        Seq("user"), "left")
      .select(col("user"), coalesce(col("m"), lit(0)).as("matched"))
  }

  /** Conversion latency: for each user completing the FULL `steps` chain
    * within `windowUs` of some anchor ([[windowFunnel]] level = K), the
    * minimum `t_K − t₁` over that user's surviving anchors — "how fast do
    * converters convert". Same greedy stage frames as [[windowFunnel]]
    * (greedy minimal continuation also minimizes the completion time for
    * a FIXED anchor, so min over anchors of the greedy tk is the true
    * minimum latency); one extra aggregation over the final frame. */
  def conversionLatency(events: DataFrame, userCol: String, tsUsCol: String,
      typeCol: String, steps: Seq[String], windowUs: Long): DataFrame = {
    require(steps.size >= 2)
    val byType = steps.map(t =>
      events.filter(col(typeCol) === t)
        .select(col(userCol).as("user"), col(tsUsCol).as("t")))
    val s1 = byType.head.select(col("user"), col("t").as("t1"), col("t").as("tk"))
    val last = byType.tail.foldLeft(s1) { (cur, ek) =>
      cur.join(ek, "user")
        .filter(col("t") > col("tk") && col("t") <= col("t1") + lit(windowUs))
        .groupBy("user", "t1")
        .agg(min(col("t")).as("tk"))
    }
    last.groupBy("user")
      .agg(min(col("tk") - col("t1")).as("latency_us"),
        count(lit(1)).as("n_anchors"))
  }

  /** `sequenceCount` for a 2-step pattern: the number of NON-OVERLAPPING
    * `first → second` chains per user, scanning left to right (the
    * ClickHouse semantics). The scan is inherently sequential, but for
    * two steps it collapses to the bracket-matching identity: treat
    * `first` as '(' and `second` as ')' — greedy matching is maximal
    * (an exchange argument: re-pairing any matched ')' with a later '('
    * can only strand more), and the unmatched-')' count is the largest
    * prefix surplus of ')' over '('. Hence
    *
    *   matches = n_second − max(0, max over prefixes (cnt₂ − cnt₁))
    *
    * — one per-user window cumsum + max, no iteration. Ties at the same
    * timestamp order `second` BEFORE `first` so a same-instant pair never
    * matches (strict `t₂ > t₁`, consistent with the other behavioral
    * aggregates); peer rows in a tie share a type, so the RANGE-frame
    * cumulative value both engines default to attains every true interior
    * maximum at a group boundary. Returns `(user, n_matches)` over users
    * with either event type. */
  def sequenceCount2(events: DataFrame, userCol: String, tsUsCol: String,
      typeCol: String, first: String, second: String): DataFrame = {
    val e = events.filter(col(typeCol).isin(first, second))
      .select(col(userCol).as("user"), col(tsUsCol).as("t"),
        when(col(typeCol) === second, 1L).otherwise(-1L).as("d"),
        when(col(typeCol) === second, 0).otherwise(1).as("ord"))
    val w = Window.partitionBy("user").orderBy(col("t"), col("ord"))
    e.withColumn("s", sum("d").over(w))
      .groupBy("user")
      .agg(sum(when(col("d") === 1L, 1L).otherwise(0L)).as("nb"),
        greatest(max("s"), lit(0L)).as("surplus"))
      .select(col("user"), (col("nb") - col("surplus")).as("n_matches"))
  }

  /** `retention`: cohort users by the DAY of their first `anchorType`
    * event, then for each `(label, eventType, startUs, endUs)` condition
    * count the cohort's users with a matching event in
    * `[first + startUs, first + endUs)`. Returns one row per cohort day:
    * `(cohort_day, users, <label columns…>)`. */
  def retention(events: DataFrame, userCol: String, tsUsCol: String,
      typeCol: String, anchorType: String,
      conds: Seq[(String, String, Long, Long)]): DataFrame = {
    val anchors = events.filter(col(typeCol) === anchorType)
      .groupBy(col(userCol).as("user")).agg(min(col(tsUsCol)).as("f"))
    val condFlags = conds.map { case (label, et, s, e) =>
      max(when(col("et") === et && col("t") >= col("f") + lit(s) &&
        col("t") < col("f") + lit(e), 1L).otherwise(0L)).as(label)
    }
    val flags = events
      .select(col(userCol).as("user"), col(tsUsCol).as("t"), col(typeCol).as("et"))
      .join(anchors, "user")
      .groupBy(col("user"), expr("f DIV 86400000000").as("cohort_day"))
      .agg(condFlags.head, condFlags.tail: _*)
    val out = count(lit(1)).as("users") +: conds.map { case (label, _, _, _) =>
      sum(col(label)).as(label)
    }
    flags.groupBy("cohort_day").agg(out.head, out.tail: _*)
  }

  /** `windowFunnel` in strict-dedup mode — a repeat of ANY
    * already-matched step kills the chain. Semantics (defined by the
    * engine family's sequential scan, stated here precisely because two
    * plausible readings differ): per anchor, the chain advances by the
    * EARLIEST valid continuation, and the advance `t_k → t_{k+1}` is
    * valid only if no event of steps 1..k lies strictly inside
    * `(t_k, t_{k+1})` (a dup at exactly `t_{k+1}` loses the race and
    * does not abort). A dup-killed anchor is dead — no re-anchoring of
    * that chain (later dups can still BE anchors of their own chains).
    *
    * Why not feasibility-max: under "exists any clean chain" semantics
    * strict-dedup degenerates to the relaxed funnel — any relaxed chain
    * re-anchors to the latest predecessor of each step, whose gaps are
    * dup-free by construction. The scan semantics is the one that
    * actually distinguishes the mode (A B B' C on pattern A→B→C: the
    * scan's A-B chain dies at B', level 2; feasibility would take
    * A-B'-C and report 3).
    *
    * Shape (single-pass, r10): ONE filtered scan + ONE per-user window
    * sort annotates every step-type row with the NEXT strictly-later
    * timestamp of EVERY step type (k expanding desc-range mins, O(n) per
    * user). The earliest continuation AND the earliest dup in a gap then
    * both read off these columns: the gap `(t_k, t_{k+1})` is dup-free
    * iff every matched step's next-occurrence at the `t_k` row is ≥ the
    * continuation (a dup AT the continuation instant loses the race —
    * the old rule, preserved). Replaces the per-stage extension-join +
    * dup-union-join chain (11 exchanges at 3 steps — the x97
    * adjudication's root cause) with k−2 slim user-keyed equi-joins. */
  def windowFunnelStrictDedup(events: DataFrame, userCol: String,
      tsUsCol: String, typeCol: String, steps: Seq[String],
      windowUs: Long): DataFrame = {
    require(steps.nonEmpty)
    val k = steps.size
    val e = events.filter(col(typeCol).isin(steps: _*))
      .select(col(userCol).as("user"), col(tsUsCol).as("t"), col(typeCol).as("et"))
    // desc order + RANGE [unbounded, 1 preceding] = values strictly
    // GREATER than the current t: nxt_s = min t' > t of step type s,
    // computed incrementally (expanding frame), ties excluded exactly as
    // the old strict `t > tk` comparisons require
    val wDesc = Window.partitionBy("user").orderBy(col("t").desc)
      .rangeBetween(Window.unboundedPreceding, -1)
    val nxtCols = steps.indices.map(s =>
      min(when(col("et") === steps(s), col("t"))).over(wDesc).as(s"nxt$s"))
    val rows = e.select(Seq(col("user"), col("t"), col("et")) ++ nxtCols: _*)
      .transform(Caching.persisted)

    // advance a frame sitting at the row of its current tk: continuation
    // = nxt_stage (earliest next-step event strictly later); valid iff
    // inside the anchor window and no matched-step dup strictly inside
    // the gap (nxt_s ≥ continuation or absent, s over steps 1..stage)
    def advance(cur: DataFrame, stage: Int): DataFrame = {
      val cont = col(s"nxt$stage")
      val clean = (0 until stage).map(s =>
        col(s"nxt$s").isNull || col(s"nxt$s") >= cont).reduce(_ && _)
      cur.filter(cont.isNotNull && cont <= col("t1") + lit(windowUs) && clean)
        .select(col("user"), col("t1"), cont.as("tk"))
        .distinct()
    }

    val anchors = rows.filter(col("et") === steps.head)
      .withColumn("t1", col("t"))
    val s1 = anchors.select(col("user"), col("t1"), col("t1").as("tk")).distinct()
    var stages = Vector(s1)
    if (k >= 2) {
      var cur = advance(anchors, 1)
      stages = stages :+ cur
      for (stage <- 2 until k) {
        // re-attach the nxt columns of the row the frame now sits on
        val at = rows.filter(col("et") === steps(stage - 1))
          .select(Seq(col("user"), col("t").as("tk")) ++
            steps.indices.map(s => col(s"nxt$s")): _*)
          .distinct()
        cur = advance(cur.join(at, Seq("user", "tk")), stage)
        stages = stages :+ cur
      }
    }

    val levels = events.select(col(userCol).as("user")).distinct()
      .select(col("user"), lit(0).as("level")) +:
      stages.zipWithIndex.map { case (s, i) =>
        s.select(col("user")).distinct().select(col("user"), lit(i + 1).as("level"))
      }
    levels.reduce(_.union(_)).groupBy("user").agg(max("level").as("level"))
  }

  /** `windowFunnel` in strict-order mode — ANY intervening event aborts
    * the chain (A→B→D→C stops at D), so the matched steps must occupy
    * CONSECUTIVE positions of the user's event stream under the total
    * `(t, id)` order, all within `windowUs` of the anchor. That makes the
    * whole funnel ONE window pass: k−1 `lead` pairs per row, a nested
    * conditional counting consecutive prefix matches, and a per-user max —
    * no per-stage joins at all (the consecutive requirement kills the
    * anchor-set recursion that the relaxed mode needs). Tie contract:
    * same-instant events are ordered by id, like every behavioral op here.
    * Returns `(user, level)` for ALL users with events. */
  def windowFunnelStrictOrder(events: DataFrame, userCol: String,
      tsUsCol: String, idCol: String, typeCol: String,
      steps: Seq[String], windowUs: Long): DataFrame = {
    require(steps.nonEmpty)
    val w = Window.partitionBy("user").orderBy("t", "id")
    val base = events.select(col(userCol).as("user"), col(tsUsCol).as("t"),
      col(idCol).as("id"), col(typeCol).as("et"))
    val withLeads = steps.indices.tail.foldLeft(base) { (d, i) =>
      d.withColumn(s"et_$i", lead(col("et"), i).over(w))
        .withColumn(s"t_$i", lead(col("t"), i).over(w))
    }
    // consecutive-prefix count: fold from the deepest step inward so the
    // conditional nests as match₁ → (1 + (match₂ → (1 + …)))
    val inner = steps.indices.tail.reverse.foldLeft(lit(0)) { (acc, i) =>
      when(col(s"et_$i") === steps(i) &&
        col(s"t_$i") <= col("t") + lit(windowUs), lit(1) + acc).otherwise(lit(0))
    }
    withLeads
      .withColumn("lvl",
        when(col("et") === steps.head, lit(1) + inner).otherwise(lit(0)))
      .groupBy("user").agg(max("lvl").as("level"))
  }

  /** `sequenceNextNode` — the "what happens after X" behavioral read:
    * for every `anchorType` event, the type of the SAME user's next
    * event under the TOTAL `(t, id)` order (the determinism rule: a
    * bare-timestamp lead is nondeterministic on ties), aggregated into
    * a successor-type distribution. Anchors with no successor are
    * counted separately (`n_terminal`) rather than dropped — the
    * terminal share is part of the answer.
    *
    * Shape: one shuffle on the user key, one lead pass, one hash
    * aggregation over O(types) groups. */
  def nextNodeCounts(events: DataFrame, userCol: String, tsUsCol: String,
      idCol: String, typeCol: String, anchorType: String): DataFrame = {
    val w = Window.partitionBy("user").orderBy("t", "id")
    events
      .select(col(userCol).as("user"), col(tsUsCol).as("t"),
        col(idCol).as("id"), col(typeCol).as("et"))
      .withColumn("nxt", lead(col("et"), 1).over(w))
      .filter(col("et") === anchorType)
      .groupBy(coalesce(col("nxt"), lit("<end>")).as("next_type"))
      .agg(count(lit(1)).as("n_anchors"))
  }

  /** Transition matrix — [[nextNodeCounts]] over EVERY anchor at once:
    * the first-order Markov flow map `(from_type, to_type) → count`
    * under the same total (t, id) per-user order, each user's last
    * event flowing to the `<end>` sink so rows sum to the event count.
    * One lead pass + one O(types²)-group aggregation — the whole
    * "where do users go next" analysis in a single shuffle on the user
    * key. */
  def transitionCounts(events: DataFrame, userCol: String, tsUsCol: String,
      idCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy("user").orderBy("t", "id")
    events
      .select(col(userCol).as("user"), col(tsUsCol).as("t"),
        col(idCol).as("id"), col(typeCol).as("et"))
      .withColumn("nxt", lead(col("et"), 1).over(w))
      .groupBy(col("et").as("from_type"),
        coalesce(col("nxt"), lit("<end>")).as("to_type"))
      .agg(count(lit(1)).as("n"))
  }
}
