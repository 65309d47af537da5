package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** SQL-QUERYABLE CATALOG over the maintained views (SURVEY.md §2.11
  * R172) — the reference's actual read UX: its users consume summary
  * tables with plain SQL, including the ad-hoc consumer joins the MVs
  * exist to serve (`/root/reference/README.md:24-189`). This registers
  * every maintained-view family as a named Spark SQL temp view with the
  * family's read contract BAKED IN — sum-collapse over the `a/` rows
  * (`kind = 'a' AND c > 0`), REPLACE-latest-wins, null-sentinel group
  * decoding, frozen-floor unions — so anything that speaks SQL can
  * consume the state tables and join them ad hoc, without knowing the
  * engines' Scala serving entries (`viewFor`, `extremaQuantiles`, ...).
  *
  * Two registration shapes:
  *
  *   - [[ofFrame]] views: the engine's serving DataFrame bound to a
  *     name. The listing underneath is resolved AT REGISTRATION — a
  *     fold that creates NEW bucket directories is invisible until the
  *     next [[register]] call, which is why [[ViewCatalog.runBatch]]
  *     re-registers its catalog's `sql` views after every committed
  *     batch (registration is plan construction only — no data moves).
  *   - POINT-READ table functions ([[aggPointRead]],
  *     [[temporalStarPointRead]], [[extremaPointRead]],
  *     [[sessionsPointRead]]): the raw bucketed state is registered
  *     with `bucket` as a PARTITION column and a SQL table function
  *     `<fn>(key)` bakes the writer's routing hash into the body
  *     (`bucket = pmod(xxhash64(key), B)`). Called with a literal, the
  *     predicate constant-folds at planning time and Catalyst PARTITION
  *     PRUNING opens exactly one bucket directory — the SQL-native twin
  *     of the Scala `viewFor` bucket-pruned point reads, checked by
  *     SqlCatalogSpec against `PartitionFilters` in the executed plan.
  *
  * 100 TB shape: a registered view adds NO execution machinery — the
  * plan is the same serving plan the Scala entries build, so pruned
  * reads stay pruned and the aggregate contracts stay one hash-agg.
  * The point-read TVFs read 1/B of the table by partition pruning, the
  * same economics as the Scala path, but driven from the SQL planner.
  *
  * Per-QUERY retrieval (r14): BM25 top-k IS expressible as a table
  * function over the registered posting state — [[bm25Read]] computes
  * the query-dependent idf in the body with the parameters confined to
  * WHERE (the aggregating-TVF correlated-ref rule). Positional PHRASE
  * search is too ([[phraseRead]]): the variable-length adjacency chain
  * needs no fixed-arity join — per doc the matched terms' position
  * lists aggregate to a token→positions MAP (params in WHERE only),
  * and a NON-aggregating outer select (where parameter references are
  * unrestricted) folds the chain with higher-order array functions:
  * occurrences = size(filter(positions(term₁), p → ∀i>1:
  * p+i−1 ∈ positions(termᵢ))). Posting STATE stays registrable via
  * [[indexState]]. */
object SqlCatalog {

  /** One named registration: `register(spark)` (re)binds the name in
    * the session catalog (temp view or SQL table function). */
  final case class SqlView(name: String)(val register: SparkSession => Unit)

  /** A plain temp view over a serving frame (re-register after folds —
    * the frame's file listing resolves at registration). */
  def ofFrame(name: String)(frame: SparkSession => DataFrame): SqlView = {
    requireSqlName(name)
    SqlView(name)(s => frame(s).createOrReplaceTempView(name))
  }

  /** (Re)bind every view. Names must be unique per call. */
  def register(spark: SparkSession, views: Seq[SqlView]): Unit = {
    require(views.map(_.name).distinct.size == views.size,
      "SQL view names must be unique")
    views.foreach(_.register(spark))
  }

  private def requireSqlName(name: String): Unit =
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"'$name' is not a plain SQL identifier")

  // ------------------------------------------------------- frames ----

  /** Binary join-aggregate `(g, total, pairs)` (R145 serving shape). */
  def joinAgg(name: String, stateDir: String): SqlView =
    ofFrame(name)(s => IncrementalJoinAgg.view(s, stateDir))

  /** Equality star `(g, total[, total2..], rows)` — sum-collapse over
    * live groups baked in. */
  def star(name: String, stateDir: String, numMeasures: Int = 1): SqlView =
    ofFrame(name)(s => IncrementalJoinAggStar.view(s, stateDir, numMeasures))

  /** Star fact-grained extrema `(g, n, min_v, max_v)`. */
  def starExtrema(name: String, stateDir: String): SqlView =
    ofFrame(name)(s => IncrementalJoinAggStar.extremaView(s, stateDir))

  /** Star exact low-quantiles (integer-rational ranks, R154). */
  def starQuantiles(name: String, stateDir: String,
      qs: Seq[(Long, Long)]): SqlView =
    ofFrame(name)(s => IncrementalJoinAggStar.extremaQuantiles(s, stateDir, qs))

  /** Star maintained exact COUNT(DISTINCT) `(g, n_distinct)` (R158). */
  def starDistinct(name: String, stateDir: String): SqlView =
    ofFrame(name)(s => IncrementalJoinAggStar.distinctView(s, stateDir))

  /** Star signed changelog `(batch, g, dtotal[, ..], drows)` — the
    * integral IS the view; useful for SQL-side as-of reads. */
  def starChangelog(name: String, stateDir: String,
      numMeasures: Int = 1): SqlView =
    ofFrame(name)(s => IncrementalJoinAggStar.changelog(s, stateDir, numMeasures))

  /** AS-OF (time-travel) read of a star/binary/interval aggregate: the
    * view as it stood after `batch` committed — the changelog integral
    * truncated at the batch (exact at and above the changelog-compaction
    * floor). Registered per pinned batch; ad-hoc batches go through
    * [[aggAsOfRead]]'s TVF, whose `upto` is a query parameter. */
  def starAsOf(name: String, stateDir: String, batch: Long,
      numMeasures: Int = 1): SqlView =
    ofFrame(name)(s =>
      IncrementalJoinAggStar.viewAsOf(s, stateDir, batch, numMeasures))

  /** Temporal star `(g1..gB, total[, ..], rows)` — null-sentinel group
    * decoding baked in (the stored `g` splits into per-branch nullable
    * columns). */
  def temporalStar(name: String, stateDir: String, numBranches: Int,
      numMeasures: Int = 1,
      root: String = IncrementalTemporalStar.Root): SqlView =
    ofFrame(name)(s =>
      IncrementalTemporalStar.view(s, stateDir, numBranches, numMeasures, root))

  /** Temporal star's maintained ENRICHED fact table (REPLACE-per-id). */
  def temporalEnriched(name: String, stateDir: String, numBranches: Int,
      numMeasures: Int = 1,
      root: String = IncrementalTemporalStar.Root): SqlView =
    ofFrame(name)(s => IncrementalTemporalStar.enrichedView(
      s, stateDir, numBranches, numMeasures, root))

  /** The SET-VALUED enriched relation under interval fan-out (R175):
    * one row per live (fact × covering window), win<b> columns naming
    * the matched windows. */
  def temporalEnrichedFanout(name: String, stateDir: String,
      numBranches: Int, intervalBranches: Set[Int], numMeasures: Int = 1,
      root: String = IncrementalTemporalStar.Root): SqlView =
    ofFrame(name)(s => IncrementalTemporalStar.enrichedFanoutView(
      s, stateDir, numBranches, intervalBranches, numMeasures, root))

  /** Interval (M:N overlap) join-aggregate `(g, total[, ..], rows)`. */
  def interval(name: String, stateDir: String,
      numMeasures: Int = 1): SqlView =
    ofFrame(name)(s => IncrementalIntervalJoinAgg.view(s, stateDir, numMeasures))

  /** Maintained sessions `(k, session_start, session_end, n_events
    * [, sm..])` — live rows ∪ frozen floor, the compaction crash rule
    * (distinct) baked in. */
  def sessions(name: String, stateDir: String,
      numMeasures: Int = 0): SqlView =
    ofFrame(name)(s => IncrementalSessions.view(s, stateDir, numMeasures))

  /** Standalone extrema relation served as `(g, n, min_v, max_v)`. */
  def extrema(name: String, stateDir: String): SqlView =
    ofFrame(name)(s => IncrementalExtrema.view(s, stateDir))

  /** Standalone exact low-quantiles `(g, q_<n>_<d>..)`. */
  def extremaQuantiles(name: String, stateDir: String,
      qs: Seq[(Long, Long)]): SqlView =
    ofFrame(name)(s => IncrementalExtrema.quantiles(s, stateDir, qs))

  /** Funnel levels `(user, level)` — deepest live stage per user. */
  def funnelLevels(name: String, stateDir: String): SqlView =
    ofFrame(name)(s => IncrementalFunnel.levels(s, stateDir))

  /** One rollup-lattice member `(g, total, rows)`. */
  def rollup(name: String, rollupDir: String, set: Seq[Int]): SqlView =
    ofFrame(name)(s => RollupMaintenance.view(s, rollupDir, set))

  /** A derived view's REPLACE-per-key rows. */
  def derived(name: String, stateDir: String, schema: StructType): SqlView =
    ofFrame(name)(s => DerivedView.view(s, stateDir, schema))

  /** One of the 8 reference MV summaries under an [[MvPipeline]] state
    * dir (the reference's literal tables, e.g. "mv_blocked_domains"). */
  def summary(name: String, stateDir: String, view: String): SqlView =
    ofFrame(name)(s => MvPipeline.readState(s, stateDir, view))

  /** Near-dup cluster labels `(doc_id, label)` (text clustering). */
  def nearDupLabels(name: String, stateDir: String): SqlView =
    ofFrame(name)(s => IncrementalNearDup.labels(s, stateDir))

  /** The inverted-index posting state, for ad-hoc SQL over postings
    * (the per-query BM25/phrase TOP-K entries stay Scala — their
    * query-dependent idf over a variable term set is not a view). */
  def indexState(name: String, stateDir: String): SqlView =
    ofFrame(name)(s => IncrementalIndex.readState(s, stateDir))

  // -------------------------------------- SQL-native point reads ----

  /** Register `<fn>_state` (raw bucketed table, `bucket` partition
    * column) and the table function `<fn>(grp)` with the writer's
    * routing hash in the body — a call with a literal group constant-
    * folds to ONE partition filter. Covers every `a/`-layout aggregate
    * (equality star / binary / interval / temporal-star-encoded-g):
    * `<fn>('g') -> (g, total[, total2..], rows)`. */
  def aggPointRead(fn: String, aPath: String, numBuckets: Int = 16,
      numMeasures: Int = 1): SqlView = {
    requireSqlName(fn)
    SqlView(fn) { s =>
      MvPipeline.assertReadLayout(s, aPath, numBuckets, 1, s"TVF $fn")
      registerStateTable(s, s"${fn}_state", aPath,
        IncrementalJoinAggStar.aSchemaN(numMeasures))
      val extras = (2 to numMeasures)
        .map(i => s", m$i AS total$i").mkString
      val extraTypes = (2 to numMeasures)
        .map(i => s", total$i BIGINT").mkString
      s.sql(s"""CREATE OR REPLACE TEMPORARY FUNCTION $fn(grp STRING)
        RETURNS TABLE (g STRING, total BIGINT$extraTypes, rows BIGINT)
        RETURN SELECT g, m AS total$extras, c AS rows FROM ${fn}_state
        WHERE bucket = pmod(xxhash64(grp), ${numBuckets}L)
          AND kind = 'a' AND c > 0 AND g = grp""")
    }
  }

  /** AS-OF point read: `<fn>(grp, upto)` — the group's aggregate as it
    * stood after batch `upto` committed, from the changelog rows alone
    * (`kind = 'c', b <= upto` — exact at and above the compaction
    * floor, whose baseline row is stamped with the floor batch). One
    * bucket opened when `grp` is a literal (the routing hash constant-
    * folds); `upto` may be any expression. Groups that net to zero at
    * `upto` answer no row (the live-group contract). */
  def aggAsOfRead(fn: String, aPath: String, numBuckets: Int = 16,
      numMeasures: Int = 1): SqlView = {
    requireSqlName(fn)
    SqlView(fn) { s =>
      MvPipeline.assertReadLayout(s, aPath, numBuckets, 1, s"TVF $fn")
      registerStateTable(s, s"${fn}_state", aPath,
        IncrementalJoinAggStar.aSchemaN(numMeasures))
      registerAsOfFloor(s, fn)
      val extras = (2 to numMeasures)
        .map(i => s", sum(m$i) AS total$i").mkString
      val extraTypes = (2 to numMeasures)
        .map(i => s", total$i BIGINT").mkString
      s.sql(s"""CREATE OR REPLACE TEMPORARY FUNCTION $fn(
          grp STRING, upto BIGINT)
        RETURNS TABLE (g STRING, total BIGINT$extraTypes, rows BIGINT)
        RETURN SELECT g, sum(m) AS total$extras, sum(c) AS rows
        FROM ${fn}_state
        WHERE bucket = pmod(xxhash64(grp), ${numBuckets}L)
          AND kind = 'c' AND g = grp AND b <= upto
        GROUP BY g HAVING sum(c) > 0""")
    }
  }

  /** Temporal-star point read: `<fn>(g1, .., gB)` with the branch
    * coordinates as parameters — the body ENCODES them into the stored
    * group key (SEP-joined, NULL as the sentinel: passing NULL for a
    * branch names its pre-first-version group exactly, the Scala
    * `viewFor(Option)` contract) and prunes to the one bucket. */
  def temporalStarPointRead(fn: String, stateDir: String, numBranches: Int,
      numBuckets: Int = 16, numMeasures: Int = 1,
      root: String = IncrementalTemporalStar.Root): SqlView = {
    requireSqlName(fn)
    SqlView(fn) { s =>
      MvPipeline.assertReadLayout(s, s"$stateDir/$root/a", numBuckets, 1,
        s"TVF $fn")
      registerStateTable(s, s"${fn}_state", s"$stateDir/$root/a",
        IncrementalJoinAggStar.aSchemaN(numMeasures))
      val params = (1 to numBranches).map(b => s"g$b STRING").mkString(", ")
      val outCols = (1 to numBranches).map(b => s"g$b STRING").mkString(", ")
      // the family's group encoding (SEP = \u0001, NULL sentinel =
      // \u0000) spelled with chr() — foldable, so the routing hash
      // still constant-folds into a partition filter
      val enc = (1 to numBranches)
        .map(b => s"coalesce(g$b, chr(0))").mkString("concat_ws(chr(1), ", ", ", ")")
      val outSel = (1 to numBranches).map(b => s"g$b").mkString(", ")
      val extras = (2 to numMeasures).map(i => s", m$i AS total$i").mkString
      val extraTypes = (2 to numMeasures).map(i => s", total$i BIGINT").mkString
      s.sql(s"""CREATE OR REPLACE TEMPORARY FUNCTION $fn($params)
        RETURNS TABLE ($outCols, total BIGINT$extraTypes, rows BIGINT)
        RETURN SELECT $outSel, m AS total$extras, c AS rows FROM ${fn}_state
        WHERE bucket = pmod(xxhash64($enc), ${numBuckets}L)
          AND kind = 'a' AND c > 0 AND g = $enc""")
    }
  }

  /** Temporal-star AS-OF point read: `<fn>(g1, .., gB, upto)` — the
    * branch-coordinate group's aggregate as it stood after batch `upto`
    * committed ([[aggAsOfRead]]'s truncation over the temporal star's
    * encoded-group `a/` layout; same NULL-sentinel coordinate encoding
    * as [[temporalStarPointRead]]). One bucket opened on literal
    * coordinates; exact at and above the compaction floor. */
  def temporalStarAsOfRead(fn: String, stateDir: String, numBranches: Int,
      numBuckets: Int = 16, numMeasures: Int = 1,
      root: String = IncrementalTemporalStar.Root): SqlView = {
    requireSqlName(fn)
    SqlView(fn) { s =>
      MvPipeline.assertReadLayout(s, s"$stateDir/$root/a", numBuckets, 1,
        s"TVF $fn")
      registerStateTable(s, s"${fn}_state", s"$stateDir/$root/a",
        IncrementalJoinAggStar.aSchemaN(numMeasures))
      registerAsOfFloor(s, fn)
      val params = (1 to numBranches).map(b => s"g$b STRING").mkString(", ")
      val outCols = (1 to numBranches).map(b => s"g$b STRING").mkString(", ")
      val enc = (1 to numBranches)
        .map(b => s"coalesce(g$b, chr(0))").mkString("concat_ws(chr(1), ", ", ", ")")
      // the SELECT list may not reference the outer parameters when the
      // body aggregates (correlated refs are WHERE/HAVING-only), so the
      // output coordinates DECODE the stored grouped key instead —
      // nullif restores the NULL sentinel
      val outSel = (1 to numBranches)
        .map(b => s"nullif(element_at(split(g, chr(1)), $b), chr(0)) AS g$b")
        .mkString(", ")
      val extras = (2 to numMeasures).map(i => s", sum(m$i) AS total$i").mkString
      val extraTypes = (2 to numMeasures).map(i => s", total$i BIGINT").mkString
      s.sql(s"""CREATE OR REPLACE TEMPORARY FUNCTION $fn(
          $params, upto BIGINT)
        RETURNS TABLE ($outCols, total BIGINT$extraTypes, rows BIGINT)
        RETURN SELECT $outSel, sum(m) AS total$extras, sum(c) AS rows
        FROM ${fn}_state
        WHERE bucket = pmod(xxhash64($enc), ${numBuckets}L)
          AND kind = 'c' AND g = $enc AND b <= upto
        GROUP BY g HAVING sum(c) > 0""")
    }
  }

  /** Extrema point read: `<fn>('g') -> (g, n, min_v, max_v)` — the
    * per-group aggregate over present values. `subBuckets` MUST match
    * the writer's R173 layout: a sub-bucketed store routes by
    * `(g, xxhash64(v) % S)`, so the plain one-bucket predicate would
    * silently aggregate a FRACTION of the group; with S > 1 the body
    * prunes to the group's ≤S buckets (merge-at-read, the Scala
    * `viewFor(subBuckets)` contract). */
  def extremaPointRead(fn: String, extremaPath: String,
      numBuckets: Int = 16, subBuckets: Int = 1): SqlView = {
    requireSqlName(fn)
    require(subBuckets >= 1, "subBuckets >= 1")
    SqlView(fn) { s =>
      MvPipeline.assertReadLayout(s, extremaPath, numBuckets, subBuckets,
        s"TVF $fn")
      registerStateTable(s, s"${fn}_state", extremaPath,
        IncrementalExtrema.vwSchema)
      val bucketPred = valueBucketPred(numBuckets, subBuckets)
      s.sql(s"""CREATE OR REPLACE TEMPORARY FUNCTION $fn(grp STRING)
        RETURNS TABLE (g STRING, n BIGINT, min_v BIGINT, max_v BIGINT)
        RETURN SELECT g, sum(w) AS n, min(v) AS min_v, max(v) AS max_v
        FROM ${fn}_state
        WHERE $bucketPred
          AND g = grp AND w > 0
        GROUP BY g""")
    }
  }

  /** Maintained exact TOP-K point read (r14): `<fn>('g', k) ->
    * (g, v, w, rank)` — the k largest live values of the named group,
    * largest first, over the extrema value-multiset state. Each (g, v)
    * pair lives in exactly ONE bucket under either layout (v routes
    * the R173 sub-coordinate), so the body needs no re-aggregation:
    * prune to the group's ≤S buckets, rank, cut at k. The SQL twin of
    * [[IncrementalExtrema.topNFor]]. */
  def extremaTopKRead(fn: String, extremaPath: String,
      numBuckets: Int = 16, subBuckets: Int = 1): SqlView = {
    requireSqlName(fn)
    require(subBuckets >= 1, "subBuckets >= 1")
    SqlView(fn) { s =>
      MvPipeline.assertReadLayout(s, extremaPath, numBuckets, subBuckets,
        s"TVF $fn")
      registerStateTable(s, s"${fn}_state", extremaPath,
        IncrementalExtrema.vwSchema)
      val bucketPred = valueBucketPred(numBuckets, subBuckets)
      s.sql(s"""CREATE OR REPLACE TEMPORARY FUNCTION $fn(grp STRING, k BIGINT)
        RETURNS TABLE (g STRING, v BIGINT, w BIGINT, rank INT)
        RETURN SELECT g, v, w, rnk AS rank FROM (
          SELECT g, v, w,
            row_number() OVER (PARTITION BY g ORDER BY v DESC) AS rnk
          FROM ${fn}_state
          WHERE $bucketPred
            AND g = grp AND w > 0)
        WHERE rnk <= k""")
    }
  }

  /** Maintained exact COUNT(DISTINCT) point read over a star's `u/`
    * table (R158): `<fn>('g') -> (g, n_distinct)` — live values only
    * (`w > 0`). `subBuckets` must match the writer's R173 layout, as
    * [[extremaPointRead]]. */
  def starDistinctPointRead(fn: String, uPath: String,
      numBuckets: Int = 16, subBuckets: Int = 1): SqlView = {
    requireSqlName(fn)
    require(subBuckets >= 1, "subBuckets >= 1")
    SqlView(fn) { s =>
      MvPipeline.assertReadLayout(s, uPath, numBuckets, subBuckets,
        s"TVF $fn")
      registerStateTable(s, s"${fn}_state", uPath,
        IncrementalExtrema.vwSchema)
      val bucketPred = valueBucketPred(numBuckets, subBuckets)
      s.sql(s"""CREATE OR REPLACE TEMPORARY FUNCTION $fn(grp STRING)
        RETURNS TABLE (g STRING, n_distinct BIGINT)
        RETURN SELECT g, count(1) AS n_distinct
        FROM ${fn}_state
        WHERE $bucketPred
          AND g = grp AND w > 0
        GROUP BY g""")
    }
  }

  /** Sessions point read: `<fn>(user) -> (k, session_start,
    * session_end, n_events)` — live ∪ frozen with the compaction
    * crash-rule distinct, both tables pruned to the user's bucket. */
  def sessionsPointRead(fn: String, stateDir: String,
      numBuckets: Int = 16): SqlView = {
    requireSqlName(fn)
    val vSchema = StructType.fromDDL(
      "k BIGINT, st BIGINT, en BIGINT, n BIGINT")
    SqlView(fn) { s =>
      MvPipeline.assertReadLayout(s, s"$stateDir/sessions/v", numBuckets, 1,
        s"TVF $fn")
      MvPipeline.assertReadLayout(s, s"$stateDir/sessions/vf", numBuckets, 1,
        s"TVF $fn")
      registerStateTable(s, s"${fn}_state_v", s"$stateDir/sessions/v", vSchema)
      registerStateTable(s, s"${fn}_state_vf", s"$stateDir/sessions/vf", vSchema)
      s.sql(s"""CREATE OR REPLACE TEMPORARY FUNCTION $fn(usr BIGINT)
        RETURNS TABLE (k BIGINT, session_start BIGINT, session_end BIGINT,
          n_events BIGINT)
        RETURN SELECT DISTINCT k, st AS session_start, en AS session_end,
          n AS n_events
        FROM (SELECT k, st, en, n, bucket FROM ${fn}_state_v
              UNION ALL SELECT k, st, en, n, bucket FROM ${fn}_state_vf)
        WHERE bucket = pmod(xxhash64(usr), ${numBuckets}L) AND k = usr""")
    }
  }

  /** The R173-aware bucket predicate for the VALUE-MULTIPLICITY tables
    * (`e/` extrema, `u/` distinct): plain layout routes by `g`, the
    * sub-bucketed layout by `(g, xxhash64(v) % S)` with sb in 0..S-1 —
    * a literal `grp` constant-folds either form into partition filters.
    * The ONE construction site (a mismatched predicate over a
    * sub-bucketed store would silently aggregate a fraction of the
    * group — both TVFs must evolve with the writer's layout together). */
  private def valueBucketPred(numBuckets: Int, subBuckets: Int): String =
    if (subBuckets == 1) s"bucket = pmod(xxhash64(grp), ${numBuckets}L)"
    else (0 until subBuckets)
      .map(i => s"pmod(xxhash64(grp, ${i}L), ${numBuckets}L)")
      .mkString("bucket IN (", ", ", ")")

  /** Per-QUERY BM25 top-k as a SQL TABLE FUNCTION (VERDICT r13 task 4)
    * over the maintained bucketed posting state
    * ([[IncrementalIndex.processBatchBucketed]]'s `postings/` +
    * `doc_lens/` tables): `<fn>(query, k)` — the query string is
    * whitespace-split in the body, scoring is the exact-rational
    * e6-quantized BM25 (k1 = 6/5, b = 3/4) of
    * [[graft.operators.InvertedIndex.bm25TopK]], so the call answers
    * exactly what `searchBm25Bucketed` answers on the same state.
    *
    * Why this is expressible where it previously wasn't claimed: the
    * Spark TVF rule that an AGGREGATING body may reference parameters
    * only in WHERE/HAVING is satisfied by construction — `query`
    * appears only in the two postings WHERE filters (term membership),
    * and `k` only in the outer rank filter ABOVE the aggregation (the
    * per-doc sum and the row_number ranking are parameter-free). The
    * per-(doc, term) score is quantized to int64 BEFORE the per-doc
    * sum, exactly as the Scala plan, so results are bit-identical.
    *
    * Scale shape: same economics as the Scala entry — the term filter
    * reaches the postings scan, df is a tiny agg over matched postings,
    * totals are a 1-row aggregate, one doc_id shuffle, rank + filter
    * instead of a global sort. */
  /** Term-membership predicate for the retrieval TVF bodies: a
    * `maxTerms`-way unrolled `token IN (try_element_at(split(...), i))`
    * — with a LITERAL call the elements constant-fold and the whole
    * predicate reaches the parquet scan as `PushedFilters: In(token,
    * [...])` (row-group dictionary/stats pruning — `array_contains`
    * over the same foldable array is NOT translatable to a source
    * filter and read every row group; measured in the r14 review). A
    * query longer than `maxTerms`: with `overLengthPassThrough` the
    * membership degrades to a CORRECT unpruned scan via the size
    * disjunct (phrase — its outer fold re-checks the phrase terms, a
    * wider map is merely unpruned); without it the call is REFUSED via
    * a WHERE-confined assert_true (bm25, r15 fix — its aggregating
    * body sums whatever matched, so pass-through would silently score
    * every token of every doc).
    * Partition-DIR pruning: [[termBucketPred]] (r15)
    * plants the same unrolled terms' routing hashes as a bucket IN
    * list, so a LITERAL call constant-folds it and opens only the
    * terms' bucket dirs; for a FREE parameter no dir pruning is
    * expressible (Spark inserts no DPP filter for a parameter-derived
    * build side — verified) and the Scala entries, which prune dirs
    * physically, stay the hot-path choice there. */
  private def termMembership(tokenCol: String, queryParam: String,
      maxTerms: Int, overLengthPassThrough: Boolean = true): String = {
    val terms = (1 to maxTerms)
      .map(i => s"try_element_at(split($queryParam, ' '), $i)")
      .mkString(", ")
    if (overLengthPassThrough)
      s"(size(split($queryParam, ' ')) > $maxTerms OR $tokenCol IN ($terms))"
    else
      // pass-through would be WRONG here (r15 fix): bm25's aggregating
      // body sums the matched tokens' scores, so letting every token
      // "match" on an over-length query mis-scores silently (phrase is
      // immune — its outer fold re-checks the phrase terms, the wider
      // map is just unpruned). Refuse loudly instead, WHERE-confined to
      // respect the TVF parameter rule.
      s"((size(split($queryParam, ' ')) <= $maxTerms OR assert_true(false, " +
        s"'bm25 TVF supports at most $maxTerms query terms — re-register " +
        s"with a larger maxTerms or use the Scala entry') IS NULL) " +
        s"AND $tokenCol IN ($terms))"
  }

  /** Bucket-DIR pruning twin of [[termMembership]] (r15 — closes known
    * limit 4, "retrieval TVFs list every bucket dir"): `bucket IN
    * (pmod(xxhash64(term_i), B) ...)` over the same unrolled terms.
    * Sound as a conjunct regardless of call shape — a posting row that
    * matches a term lives in that term's bucket by the writer's routing
    * hash, so the predicate is true for every needed row. On a LITERAL
    * call every element constant-folds to a bucket id and Catalyst
    * PARTITION PRUNING opens only the terms' bucket dirs (the Scala
    * entries' physical-prune economics, now from the SQL planner); a
    * free parameter leaves the list unfoldable — no dir pruning, the
    * row-group `In` filter still applies, exactly the pre-r15 shape.
    * Over-length queries degrade to unpruned via the same size
    * disjunct. A query shorter than `maxTerms` contributes
    * `xxhash64(NULL)` elements — xxhash64 folds null to its seed, one
    * spurious-but-harmless extra bucket id, never a missed one. */
  private def termBucketPred(bucketCol: String, queryParam: String,
      maxTerms: Int, numBuckets: Int): String = {
    val ids = (1 to maxTerms)
      .map(i =>
        s"pmod(xxhash64(try_element_at(split($queryParam, ' '), $i)), ${numBuckets}L)")
      .mkString(", ")
    s"(size(split($queryParam, ' ')) > $maxTerms OR $bucketCol IN ($ids))"
  }

  def bm25Read(fn: String, stateDir: String, numBuckets: Int = 16,
      maxTerms: Int = 16): SqlView = {
    requireSqlName(fn)
    require(maxTerms >= 1, "maxTerms >= 1")
    SqlView(fn) { s =>
      MvPipeline.assertReadLayout(s, s"$stateDir/postings", numBuckets, 1,
        s"TVF $fn")
      MvPipeline.assertReadLayout(s, s"$stateDir/doc_lens", numBuckets, 1,
        s"TVF $fn")
      registerStateTable(s, s"${fn}_postings", s"$stateDir/postings",
        StructType.fromDDL("token STRING, doc_id BIGINT, tf BIGINT"))
      registerStateTable(s, s"${fn}_lens", s"$stateDir/doc_lens",
        StructType.fromDDL("doc_id BIGINT, dl BIGINT"))
      val memberD =
        termMembership("token", "query", maxTerms, overLengthPassThrough = false) +
        " AND " + termBucketPred("bucket", "query", maxTerms, numBuckets)
      val memberM =
        termMembership("m.token", "query", maxTerms, overLengthPassThrough = false) +
        " AND " + termBucketPred("m.bucket", "query", maxTerms, numBuckets)
      s.sql(s"""CREATE OR REPLACE TEMPORARY FUNCTION $fn(
          query STRING, k BIGINT)
        RETURNS TABLE (doc_id BIGINT, matched BIGINT, score_e6 BIGINT)
        RETURN SELECT doc_id, matched, score_e6 FROM (
          SELECT doc_id, matched, score_e6,
            row_number() OVER (ORDER BY score_e6 DESC, doc_id) AS rnk
          FROM (
            SELECT m.doc_id, count(1) AS matched,
              sum(CAST(floor(((22L * m.tf * t.n_docs * t.total_len) /
                (d.df * (10L * m.tf * t.total_len + 3L * t.total_len
                  + 9L * l.dl * t.n_docs))) * 1e6 + 0.5D) AS BIGINT))
                AS score_e6
            FROM ${fn}_postings m
            JOIN (SELECT token, count(1) AS df FROM ${fn}_postings
                  WHERE $memberD
                  GROUP BY token) d ON m.token = d.token
            JOIN ${fn}_lens l ON m.doc_id = l.doc_id
            CROSS JOIN (SELECT count(1) AS n_docs,
                          CAST(sum(dl) AS BIGINT) AS total_len
                        FROM ${fn}_lens) t
            WHERE $memberM
            GROUP BY m.doc_id))
        WHERE rnk <= k""")
    }
  }

  /** Per-QUERY exact PHRASE search as a SQL TABLE FUNCTION (r14) over
    * the maintained BUCKETED positional postings
    * ([[IncrementalIndex.processBatchPositionalBucketed]]):
    * `<fn>('exact phrase here')` answers exactly what
    * [[IncrementalIndex.searchPhrase]] answers — per-doc occurrence
    * counts, a doc row iff ≥1 occurrence. The aggregating inner query
    * collapses the MATCHED terms' rows (parameter confined to its
    * WHERE) into a per-doc token→positions map; the outer select is
    * non-aggregating, so it may use the parameter freely to fold the
    * adjacency chain: a position p of the phrase's FIRST term starts an
    * occurrence iff every later term i holds p+i−1. Probe cost: the
    * term-membership predicate reaches the parquet scan as a pushed
    * `In` filter on literal calls ([[termMembership]] — row-group
    * dictionary/stats pruning), and since r15 a literal call also
    * PARTITION-PRUNES to the terms' bucket dirs ([[termBucketPred]]);
    * only a FREE-parameter call still lists every dir (no DPP for a
    * parameter-derived bucket id — the Scala
    * [[IncrementalIndex.searchPhraseBucketed]] prunes dirs physically
    * and is the hot-path entry there). */
  def phraseRead(fn: String, stateDir: String,
      numBuckets: Int = 16, maxTerms: Int = 16): SqlView = {
    requireSqlName(fn)
    require(maxTerms >= 1, "maxTerms >= 1")
    SqlView(fn) { s =>
      MvPipeline.assertReadLayout(s, s"$stateDir/positional", numBuckets, 1,
        s"TVF $fn")
      registerStateTable(s, s"${fn}_positional", s"$stateDir/positional",
        StructType.fromDDL("token STRING, doc_id BIGINT, positions ARRAY<INT>"))
      // the occurrence count appears in the SELECT list and the WHERE;
      // one construction site so the two cannot diverge
      val occ = """CAST(size(filter(
          coalesce(element_at(tp, element_at(split(phrase, ' '), 1)), array()),
          p -> forall(filter(sequence(1, size(split(phrase, ' '))), i -> i > 1),
            i -> array_contains(
              coalesce(element_at(tp, element_at(split(phrase, ' '), i)), array()),
              p + i - 1)))) AS BIGINT)"""
      s.sql(s"""CREATE OR REPLACE TEMPORARY FUNCTION $fn(phrase STRING)
        RETURNS TABLE (doc_id BIGINT, occurrences BIGINT)
        RETURN SELECT doc_id, $occ AS occurrences
        FROM (
          SELECT doc_id,
            map_from_entries(collect_list(struct(token, positions))) AS tp
          FROM ${fn}_positional
          WHERE ${termMembership("token", "phrase", maxTerms)}
            AND ${termBucketPred("bucket", "phrase", maxTerms, numBuckets)}
          GROUP BY doc_id)
        WHERE $occ > 0""")
    }
  }

  /** `<fn>_floor` beside an as-of TVF (ADVICE r13): a 1-row view of
    * the changelog-compaction floor — `min(b)` over the `kind = 'c'`
    * rows (compaction stamps its baseline rows with the floor batch,
    * so this IS the earliest batch an as-of read answers exactly; -1 =
    * empty changelog). SQL callers validate their `upto` against it
    * (`upto >= floor` ⇒ exact; below it the TVF's `b <= upto`
    * truncation silently excludes the baseline) — the discoverability
    * the Scala callers get from inspecting the changelog, surfaced on
    * the SQL side. */
  private def registerAsOfFloor(s: SparkSession, fn: String): Unit =
    s.sql(s"""CREATE OR REPLACE TEMPORARY VIEW ${fn}_floor AS
      SELECT coalesce(min(b), -1L) AS floor
      FROM ${fn}_state WHERE kind = 'c'""")

  /** Register a raw bucketed state table with `bucket` as a partition
    * column (`basePath` read). REFUSES a dir carrying swap leftovers
    * (`bucket=N.tmp` / `bucket=N.old`) — partition discovery would
    * parse them as bogus partition values and read stale data; run the
    * owning stream's recovery (any merge) first. A missing/empty table
    * registers as an empty view with the caller's schema so point
    * reads on a not-yet-folded view answer empty, not error. */
  private[streaming] def registerStateTable(spark: SparkSession,
      viewName: String, path: String, schema: StructType): Unit = {
    // frame memoized per (session, dir, listing signature): the TVF
    // registrations re-bind per query call, and the partition-discovery
    // listing dominated the SQL-surface queries (optimization r17 —
    // StateRead doc); the swap-leftover refusal re-runs on every
    // signature change, which is exactly when leftovers can appear
    val df = StateRead.memo(spark, s"sqlstate:$path", path) {
      val base = new Path(path)
      val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val live = fs.exists(base) && {
        val entries = fs.listStatus(base).map(_.getPath.getName)
        val foreign = entries.filterNot(n =>
          n.matches("bucket=\\d+") || n.startsWith("_") || n.startsWith("."))
        require(foreign.isEmpty,
          s"cannot register $path as a SQL state table: non-bucket " +
            s"entries ${foreign.mkString(", ")} (crash leftovers? run a " +
            "merge on the owning view to recover, then re-register)")
        entries.exists(_.matches("bucket=\\d+"))
      }
      if (live) spark.read.option("basePath", path).parquet(path)
      else spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .withColumn("bucket", org.apache.spark.sql.functions.lit(0))
    }
    df.createOrReplaceTempView(viewName)
  }
}
