package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** Graph-shaped corpus operators. Near-duplicate detection emits
  * candidate PAIRS (q21–q24); turning pairs into dedup decisions needs
  * CONNECTED COMPONENTS — "keep one document per component", the step
  * that actually shrinks the corpus. */
object Graph {

  /** q70: connected-components dedup clustering. Candidate edges come
    * from two cheap blocking systems — same (lang, source) and same
    * (lang, 64-char length band) — each contributing star edges to its
    * block's min doc_id; overlapping stars chain blocks together, so
    * components genuinely require the transitive closure (a single
    * groupBy cannot produce them). The closure runs as large-star/
    * small-star contraction ([[connectedComponents]]): O(log n) rounds
    * of the join+min primitive, diameter-independent, nothing through
    * the driver but the per-round convergence accumulators. The oracle
    * computes the identical closure with a recursive CTE. */
  def q70DedupComponents(spark: SparkSession, dir: String): DataFrame = {
    // Star edges to each block's min doc_id via groupBy-min + join back
    // (r20): the former min-over-window pair shuffled AND sorted the
    // whole docs table twice; the aggregate form computes block minima
    // with map-side partial min (shuffling one row per block) and the
    // join back broadcasts the tiny minima table (AQE sizes it at
    // runtime — no forced hint, so a pathological block count degrades
    // to a shuffle join instead of an OOM). Same edges, no corpus sort.
    // NULL-SAFE join keys (ADVICE r20): the window form this replaced
    // groups NULL lang/source/band values together, and so does the
    // oracle's MIN() OVER (PARTITION BY ...) — a plain equi-join would
    // silently drop NULL-keyed docs' star edges. <=> keys still plan as
    // hash joins (EqualNullSafe is an equi-join key), so the r20 plan
    // shape (partial-agg exchange + runtime broadcast) is unchanged.
    val d = t(spark, dir, "documents").select("doc_id", "lang", "source", "n_chars")
    val d2 = d.withColumn("band", expr("n_chars DIV 64"))
    val m1 = d.groupBy("lang", "source").agg(min("doc_id").as("b"))
      .withColumnRenamed("lang", "lang_m").withColumnRenamed("source", "source_m")
    val m2 = d2.groupBy("lang", "band").agg(min("doc_id").as("b"))
      .withColumnRenamed("lang", "lang_m").withColumnRenamed("band", "band_m")
    val b1 = d.join(m1, col("lang") <=> col("lang_m") && col("source") <=> col("source_m"))
      .select(col("doc_id").as("a"), col("b"))
    val b2 = d2.join(m2, col("lang") <=> col("lang_m") && col("band") <=> col("band_m"))
      .select(col("doc_id").as("a"), col("b"))
    val e0 = b1.union(b2).filter(col("a") =!= col("b")).distinct()
    val labels = connectedComponents(
      d.select(col("doc_id").as("node")), e0)
    labels.groupBy(col("label").as("cluster"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("cluster")
  }

  /** Connected components by alternating large-star / small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce
    * and Beyond"): `nodes` (col `node`) ∪ undirected `edges` (cols
    * `a`,`b`) → (`node`, `label`) with label = the component's min
    * node.
    *
    * Why contraction and not plain min-label propagation: propagation
    * needs O(graph-diameter) rounds, and LSH near-dup graphs contain
    * PATH components (a≈b≈c≈…) whose diameter grows with the corpus —
    * at 100 TB an unbounded chain would either iterate for hours or
    * hit an arbitrary round cap after the expensive candidate
    * generation already ran. Contraction uses the identical per-round
    * primitive — one groupBy-min plus one shuffle join — but rewires
    * every node toward its neighborhood minimum, which provably
    * converges in O(log n) rounds regardless of diameter, so there is
    * no round cap at all. Propagation stays in the tree as
    * [[labelPropagation]], the spec's oracle twin.
    *
    * Per round (ONE Spark job): large-star points every node's
    * larger neighbors at the neighborhood min; small-star re-points
    * the smaller neighbors; the round's edge set is localCheckpoint'ed
    * (lineage otherwise doubles per iteration — on a cluster,
    * checkpoint to reliable storage for executor-loss safety) and the
    * convergence statistics ride that same materialization as
    * accumulators (changed-edge marker from a left join against the
    * previous round + a row counter), so no separate count() job runs.
    * Accumulators can over-count under task retry — never under-count
    * — so a retry can only add a (cheap, already-converged) round,
    * never terminate early. */
  /** Rounds the last [[connectedComponents]] call took — observability
    * for specs and probes (the O(log n) claim is asserted, not
    * assumed: GraphCcSpec bounds a 200-node path graph, which plain
    * propagation would need 199 rounds for). Driver-side only. */
  @volatile var lastRounds: Int = 0

  def connectedComponents(nodes: DataFrame, edges0: DataFrame): DataFrame = {
    val spark = nodes.sparkSession
    import org.apache.spark.sql.{Encoders, Row}
    // canonical orientation: every edge stored (a, b) with a > b. The
    // initial cardinality rides the SAME eager-checkpoint
    // materialization as each round's stats (accumulator on the first
    // pass), so round 0 pays no separate count() job; accumulator
    // over-count under retry only inflates prevRows, which errs toward
    // one extra (already-converged) round, never early termination.
    val e0 = edges0.filter(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("a"),
        least(col("a"), col("b")).as("b"))
      .distinct()
    val accInit = spark.sparkContext.longAccumulator("graft-cc-rows-init")
    var e = e0.mapPartitions { it =>
      it.map { r => accInit.add(1); r }
    }(Encoders.row(org.apache.spark.sql.types.StructType(e0.schema)))
      .localCheckpoint(true)
    var prevRows = accInit.value
    var converged = prevRows == 0
    var iter = 0
    while (!converged) {
      // Broadcast dispatch (r20): a checkpointed round carries no
      // stats, so every in-loop join otherwise plans sort-merge —
      // shuffle + sort per join per round over what is usually a tiny
      // contracted edge set. prevRows is the EXACT cardinality of `e`
      // (accumulator on the round's materialization), and every
      // build side below is bounded by ~2·|e| rows, so under a 64 MiB
      // framed ceiling the min-tables and the convergence probe
      // broadcast; past it the scale-safe shuffle joins stay.
      val small = prevRows * 48 <= (64L << 20)
      def maybeB(df: DataFrame): DataFrame = if (small) broadcast(df) else df
      // large-star: for each node u, point every neighbor v > u at
      // m = min(N(u) ∪ {u}). Each canonical edge is seen from its
      // smaller endpoint; output stays canonical (v > u ≥ m).
      val sym = e.union(e.select(col("b").as("a"), col("a").as("b")))
      val lsMin = sym.groupBy("a").agg(min(col("b")).as("mn"))
        .select(col("a"), least(col("a"), col("mn")).as("m"))
      val ls = sym.join(maybeB(lsMin), "a").where(col("b") > col("a"))
        .select(col("b").as("a"), col("m").as("b"))
      // small-star: for each node u (edges now all point down), point
      // u and its non-min neighbors at m = min(N(u) ∪ {u}) = min(b).
      val ssMin = ls.groupBy("a").agg(min(col("b")).as("m"))
      val ss = ls.join(maybeB(ssMin), "a").where(col("b") =!= col("m"))
        .select(col("b").as("a"), col("m").as("b"))
        .union(ssMin.select(col("a"), col("m").as("b")))
        .distinct()
      // converged iff the edge SET is unchanged: no edge absent from
      // the previous round (accNew) and the same cardinality (accRows)
      val accNew = spark.sparkContext.longAccumulator(s"graft-cc-new-$iter")
      val accRows = spark.sparkContext.longAccumulator(s"graft-cc-rows-$iter")
      val marked = ss.join(maybeB(e.withColumn("__old", lit(1))),
        Seq("a", "b"), "left_outer")
      val outSchema = org.apache.spark.sql.types.StructType(marked.schema.take(2))
      val next = marked.mapPartitions { it =>
        it.map { r =>
          accRows.add(1)
          if (r.isNullAt(2)) accNew.add(1)
          Row(r.get(0), r.get(1))
        }
      }(Encoders.row(outSchema)).localCheckpoint(true)
      converged = accNew.value == 0 && accRows.value == prevRows
      prevRows = accRows.value
      e = next
      iter += 1
    }
    lastRounds = iter
    // fixpoint is a star forest rooted at each component's min node.
    // The star side's cardinality is KNOWN exactly (prevRows, from the
    // accumulator that rode the final checkpoint) — a localCheckpoint'd
    // frame otherwise carries no stats and the planner falls back to a
    // sort-merge join that shuffles and sorts every node (r20: the q70
    // plan showed exactly that). Below ~64 MiB of framed edges (24 B a
    // row, conservatively), broadcast the stars; past it, keep the
    // scale-safe shuffle join.
    val eSide = if (prevRows * 24 <= (64L << 20)) broadcast(e) else e
    nodes.join(eSide, nodes("node") === eSide("a"), "left")
      .select(nodes("node"), coalesce(col("b"), nodes("node")).as("label"))
  }

  /** The plain min-label propagation twin — O(diameter) rounds, kept
    * as the independently-derived oracle the spec cross-checks
    * [[connectedComponents]] against (and a readable statement of the
    * semantics). Not used by any query: path-shaped components make
    * its round count unbounded, hence the explicit cap here. */
  def labelPropagation(nodes: DataFrame, edges0: DataFrame): DataFrame = {
    val edges = edges0.select(col("a"), col("b"))
      .union(edges0.select(col("b").as("a"), col("a").as("b")))
      .distinct().cache()
    var labels = nodes.select(col("node"), col("node").as("label"))
      .localCheckpoint(true)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < 64) {
      val nbrMin = edges.as("e")
        .join(labels.as("l"), col("e.b") === col("l.node"))
        .select(col("e.a").as("node"), col("l.label").as("nlabel"))
        .groupBy("node").agg(min("nlabel").as("nmin"))
      // previous label rides ALONG inside the checkpointed round, so
      // the convergence count is a filter over it — not a second join
      val next = labels.as("l").join(nbrMin.as("n"), Seq("node"), "left")
        .select(col("node"),
          least(col("l.label"), coalesce(col("n.nmin"), col("l.label"))).as("label"),
          col("l.label").as("prev"))
        .localCheckpoint(true)
      changed = next.filter(col("label") =!= col("prev")).count()
      labels = next.select("node", "label")
      iter += 1
    }
    require(changed == 0, s"label propagation did not converge in $iter rounds")
    edges.unpersist()
    labels
  }

  val q70Sql: String =
    """WITH RECURSIVE b1 AS (
         SELECT doc_id, MIN(doc_id) OVER (PARTITION BY lang, source) AS rep
         FROM documents
       ), b2 AS (
         SELECT doc_id, MIN(doc_id) OVER (PARTITION BY lang, n_chars // 64) AS rep
         FROM documents
       ), edges0 AS (
         SELECT doc_id AS a, rep AS b FROM b1 WHERE doc_id <> rep
         UNION SELECT doc_id, rep FROM b2 WHERE doc_id <> rep
       ), edges AS (
         SELECT a, b FROM edges0 UNION SELECT b, a FROM edges0
       ), rec AS (
         SELECT doc_id AS node, doc_id AS label FROM documents
         UNION
         SELECT e.a AS node, r.label FROM rec r JOIN edges e ON e.b = r.node
       ), cc AS (
         SELECT node, MIN(label) AS cluster FROM rec GROUP BY node
       )
       SELECT cluster::BIGINT AS cluster, COUNT(*)::BIGINT AS n_docs
       FROM cc GROUP BY cluster ORDER BY cluster"""

  /** q71: the end-to-end near-dup PURGE — what the dedup suite exists
    * to produce. MinHash-LSH candidates → exact-jaccard verified pairs
    * (q22's plan, sub-quadratic: ratio 4.9 at 128× data in the r8
    * sweep) → connected components → keep each component's min doc.
    * Per language: total docs, survivors, removed. The oracle
    * recomputes the pairs brute-force and closes them with a recursive
    * CTE — so the WHOLE composition (LSH recall included) is gated,
    * not just the clustering step. */
  def q71NearDupPurge(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.q22MinhashLsh(spark, dir)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val docs = t(spark, dir, "documents").select("doc_id", "lang")
    val labels = connectedComponents(docs.select(col("doc_id").as("node")), pairs)
    docs.join(labels, docs("doc_id") === labels("node"))
      .groupBy("lang")
      .agg(count(lit(1)).as("docs"),
        sum(when(col("label") === col("node"), 1L).otherwise(0L)).as("survivors"))
      .withColumn("removed", col("docs") - col("survivors"))
      .orderBy("lang")
  }

  val q71Sql: String = {
    val sh = graft.queries.Dedup.ShinglesDuck
    s"""WITH RECURSIVE sh AS (SELECT doc_id, $sh AS gr FROM documents),
       pairs AS (
         SELECT a.doc_id AS a, b.doc_id AS b
         FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         WHERE len(list_intersect(a.gr, b.gr))::DOUBLE
             / len(list_distinct(list_concat(a.gr, b.gr))) >= 0.8
       ), edges AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
       rec AS (
         SELECT doc_id AS node, doc_id AS label FROM documents
         UNION
         SELECT e.a AS node, r.label FROM rec r JOIN edges e ON e.b = r.node
       ), cc AS (SELECT node, MIN(label) AS cluster FROM rec GROUP BY node)
       SELECT d.lang, COUNT(*)::BIGINT AS docs,
              SUM(CASE WHEN cc.cluster = d.doc_id THEN 1 ELSE 0 END)::BIGINT
                AS survivors,
              (COUNT(*) -
               SUM(CASE WHEN cc.cluster = d.doc_id THEN 1 ELSE 0 END))::BIGINT
                AS removed
       FROM documents d JOIN cc ON cc.node = d.doc_id
       GROUP BY d.lang ORDER BY d.lang"""
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q70_dedup_components" -> (q70DedupComponents _),
    "q71_near_dup_purge" -> (q71NearDupPurge _))

  val oracles: Map[String, String] = Map(
    "q70_dedup_components" -> q70Sql,
    "q71_near_dup_purge" -> q71Sql)
}
