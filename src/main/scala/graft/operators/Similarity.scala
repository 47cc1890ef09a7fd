package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Approximate-nearest-neighbor / similarity search over the
  * `embeddings` table (64-dim array<float>).
  *
  *   - Brute-force cosine top-k: broadcast the (small) query set against
  *     the corpus — the correct baseline at any scale where |queries| is
  *     bounded; the corpus side streams, no shuffle of the corpus.
  *   - Sign-LSH bucketed top-k: bucket both sides by the sign bits of
  *     the leading dimensions (an axis-aligned random-hyperplane LSH);
  *     the join is keyed on the bucket — candidate count collapses by
  *     ~2^bits, the 100 TB scale path (trade recall for a keyed join).
  *   - Label centroids: element-wise mean via posexplode + exact
  *     DECIMAL sums (deterministic at any partitioning).
  *
  * Determinism: dot products fold the 64 element products strictly
  * left-to-right (higher-order `aggregate`), matching the oracle's
  * sequential `list_reduce` — bit-identical IEEE sums. Ranking uses the
  * cosine ROUNDED to 6 decimals with a vec_id tie-break so a last-ulp
  * difference can never flip an ordering.
  */
object Similarity {

  /** float[] → double[] so all arithmetic is IEEE double both sides. */
  private def dbl(c: Column): Column = transform(c, x => x.cast("double"))

  /** Cosine via the engine's native codegen'd Catalyst expression
    * (graft.functions.CosineSimilarity): one fused Java loop per pair
    * inside whole-stage codegen. The higher-order formulation
    * (`aggregate(zip_with(...))`) computes the same fold but runs its
    * lambdas interpreted, per element — measurably slower in a kNN
    * inner loop. Arithmetic (left-to-right single pass, divide last) is
    * bit-identical to the oracle's sequential list_reduce.
    */
  private def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(graft.functions.CosineSimilarity(
      Bridge.expression(a), Bridge.expression(b)))
  }

  /** Brute-force cosine top-k: query vectors vec_id < nQueries against
    * the rest of the corpus. Broadcast nested-loop on the tiny query
    * side is intentional (queries are a constant-size set).
    */
  def knnBrute(s: SparkSession, d: String, nQueries: Int = 8, k: Int = 5): DataFrame = {
    val e = Tables.embeddings(s, d)
    val queries = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), dbl(col("embedding")).as("q"))
    val corpus = e.filter(col("vec_id") >= nQueries)
      .select(col("vec_id").as("c_id"), dbl(col("embedding")).as("c"))
    val w = Window.partitionBy("q_id").orderBy(desc("cos6"), asc("c_id"))
    corpus.join(broadcast(queries))
      .withColumn("cos6", round(cosine(col("q"), col("c")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "c_id", "cos6")
      .orderBy("q_id", "rank")
  }

  /** Sign-LSH bucket of a vector: bits = sign of dims 1..nBits. */
  private def signBucket(v: Column, nBits: Int): Column =
    (1 to nBits).map(i =>
      when(element_at(v, i) > 0, lit(1 << (i - 1))).otherwise(lit(0)))
      .reduce(_ + _)

  /** Bucketed ANN: candidates restricted to the query's sign-LSH bucket;
    * the join is a keyed hash join on the bucket id (the scale path —
    * no broadcast of the corpus, no cartesian).
    */
  def knnBucketed(s: SparkSession, d: String, nQueries: Int = 8, k: Int = 3,
                  nBits: Int = 4): DataFrame = {
    val e = Tables.embeddings(s, d)
    val queries = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), dbl(col("embedding")).as("q"),
        signBucket(col("embedding"), nBits).as("bucket"))
    val corpus = e.filter(col("vec_id") >= nQueries)
      .select(col("vec_id").as("c_id"), dbl(col("embedding")).as("c"),
        signBucket(col("embedding"), nBits).as("bucket"))
    val w = Window.partitionBy("q_id").orderBy(desc("cos6"), asc("c_id"))
    corpus.join(queries, "bucket")
      .withColumn("cos6", round(cosine(col("q"), col("c")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "c_id", "cos6", "bucket")
      .orderBy("q_id", "rank")
  }

  /** Embedding-cosine near-duplicate pairs: candidates restricted to
    * sign-LSH bucket collisions (keyed join — no all-pairs), kept when
    * cosine ≥ minCos. The embedding-space sibling of Dedup.minhashLsh:
    * at 100 TB you never materialize the n² pair space, only bucket
    * collisions. (This corpus has no planted embedding dups — max
    * pairwise cosine ≈ 0.51 — so the demonstration threshold 0.4
    * surfaces the closest genuine pairs.)
    */
  def embedNearDup(s: SparkSession, d: String, minCos: Double = 0.4,
                   nBits: Int = 4): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), dbl(col("embedding")).as("v"),
        signBucket(col("embedding"), nBits).as("bucket"))
    e.as("a")
      .join(e.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos6", round(cosine(col("a.v"), col("b.v")), 6))
      .filter(col("cos6") >= minCos)
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"), col("cos6"))
      .orderBy("id1", "id2")
  }

  /** IVF-style ANN: label centroids act as the coarse quantizer
    * ("inverted file" cells); every vector is assigned to its
    * highest-dot-product centroid, and search runs only within the
    * query's cell — the classic IVF trade (recall for a keyed join)
    * and the second scale path next to sign-LSH bucketing.
    *
    * Determinism: centroid means use exact integer micro-units, and
    * cell assignment scores are per-term-quantized integer sums
    * (`round(v[pos]·mean·1e12)` per dimension, summed as BIGINT), so
    * the argmax cell is bit-identical in the oracle — no float sum
    * order dependence anywhere in the pipeline.
    */
  /** Tall (vec_id, pos, x) view of the embedding corpus, x as double. */
  private def tallView(e: DataFrame): DataFrame =
    e.select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "xf")))
      .withColumn("x", col("xf").cast("double")).drop("xf")

  /** Per-label full-dim centroids (c_label, pos, c_mean) in exact
    * integer micro-units — the deterministic codebook shared by the
    * IVF coarse quantizer and the PQ sub-quantizers. Checkpointed:
    * every caller joins it several times.
    */
  private def labelMeans(tall: DataFrame, eLab: DataFrame): DataFrame =
    tall.join(eLab, "vec_id")
      .withColumn("micro", round(col("x") * lit(1000000.0)).cast("long"))
      .groupBy(col("label").as("c_label"), col("pos"))
      .agg((sum("micro").cast("double") / lit(1000000.0) / count(lit(1)))
        .as("c_mean"))
      .transform(Checkpoints.persistFrame)

  /** IVF coarse-quantizer cell per vector (vec_id, cell): argmax over
    * integer-quantized centroid dot terms — shared by [[knnIvf]] and
    * [[knnHybrid]]. Checkpointed: callers join it on both the query
    * and the corpus side.
    */
  private def ivfCells(e: DataFrame): DataFrame = ivfCellsFrom(e, e)

  /** Cell assignment with the codebook and the assignment target
    * decoupled: centroids come from `codebookE` only, every vector of
    * `targetE` is assigned to its argmax centroid. `ivfCells` is the
    * one-shot case (codebook == target); the incremental index
    * ([[s9IncrementalIvf]]) freezes the codebook on the initial load
    * and assigns each later batch against it — the standard serving
    * shape (re-clustering the corpus per batch would both cost a full
    * pass AND silently re-shuffle existing cell assignments).
    */
  private def ivfCellsFrom(codebookE: DataFrame, targetE: DataFrame): DataFrame =
    assignCells(codebookCentroids(codebookE), targetE)
      .transform(Checkpoints.persistFrame)

  /** The stored codebook artifact: per-label full-dim centroids in
    * exact micro-units, checkpointed. Incremental maintainers compute
    * this ONCE and assign every later batch against it — the codebook
    * is the persisted thing, not something re-derived per batch.
    */
  private def codebookCentroids(codebookE: DataFrame): DataFrame =
    labelMeans(tallView(codebookE),
      codebookE.select(col("vec_id"), col("label")))

  /** Argmax-centroid assignment of `targetE` against a prebuilt
    * centroid frame — computed ROW-LOCALLY by the codegen'd
    * [[graft.functions.IvfAssign]] expression against the centroids
    * inlined as a ~5 KB literal (a bounded cells×dims collect, the
    * PQ-codebook class of driver action). The prior relational shape —
    * posexplode ⋈ centroids on pos → per-(vec, cell) SUM → window
    * argmax — shuffled |corpus|·cells score rows (and the tall explode
    * before them) to answer a question each row can answer alone; same
    * preference order and arithmetic contract as [[knnPq]]'s encoder
    * (oracle hashes unchanged). Not checkpointed — callers that
    * immediately materialize the result (e.g. a snapshot commit) would
    * otherwise pay a second, redundant materialization.
    */
  private def assignCells(centroids: DataFrame, targetE: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    val rows = centroids.select("c_label", "pos", "c_mean").collect()
    require(rows.nonEmpty,
      "empty codebook: the centroid frame has no rows — the codebook " +
        "source (initial lake commit / codebookE) must be non-empty")
    val dims = rows.iterator.map(_.getAs[Number]("pos").intValue()).max + 1
    val byLabel = rows.toSeq
      .groupBy(_.getAs[Number]("c_label").intValue()).toSeq.sortBy(_._1)
    val matrix = byLabel.map { case (_, rs) =>
      val arr = new Array[Double](dims)
      rs.foreach(r =>
        arr(r.getAs[Number]("pos").intValue()) = r.getAs[Double]("c_mean"))
      arr.toSeq
    }
    val cell = Bridge.column(graft.functions.IvfAssign(
      Bridge.expression(dbl(col("embedding"))),
      Bridge.expression(typedLit(matrix)),
      Bridge.expression(typedLit(byLabel.map(_._1)))))
    targetE.select(col("vec_id"), cell.as("cell"))
  }

  def knnIvf(s: SparkSession, d: String, nQueries: Int = 8, k: Int = 3): DataFrame = {
    val e = Tables.embeddings(s, d)
    knnIvfFrom(e, ivfCells(e), nQueries, k)
  }

  /** SemDeDup-style SEMANTIC dedup (Abbas et al. 2023's shape): drop
    * documents whose embeddings are near-identical in meaning even
    * when their text is not. Candidates are restricted to IVF cells
    * (the deterministic integer-micro codebook [[ivfCells]] shares
    * with the ANN family — at 100 TB the n² pair space is never
    * materialized, only within-cell collisions), and the keep rule is
    * ε-DOMINANCE: a vector is dropped iff some LOWER-id vector in its
    * cell has cosine ≥ `tau` with it. Deterministic (no float-order
    * or init sensitivity anywhere: quantized centroid argmax + cosine
    * rounded to 6dp), embarrassingly parallel (no sequential greedy
    * pass), and a conservative superset of greedy ε-ball dedup
    * (everything greedy drops, dominance drops). Output: per-cell
    * vector/drop/keep counts plus the kept-id checksum the oracle
    * pins exactly.
    *
    * Scale note: within-cell pairing is O(Σ cell²), so the cell count
    * must grow with the corpus (k ≈ n / target-cell-size keeps the
    * pair volume linear — the published setting uses tens of
    * thousands of k-means cells at billions of docs). This demo's
    * codebook is the 10-label corpus codebook shared with the ANN
    * family; swap in a larger k-means codebook via [[ivfCellsFrom]]
    * for production cell sizing.
    */
  def semanticDedup(s: SparkSession, d: String, tau: Double = 0.4): DataFrame = {
    val e = Tables.embeddings(s, d)
    val v = e.select(col("vec_id"), dbl(col("embedding")).as("v"))
      .join(ivfCells(e), "vec_id")
    val dropped = v.as("a")
      .join(v.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .filter(round(cosine(col("a.v"), col("b.v")), 6) >= tau)
      .select(col("b.vec_id").as("vec_id")).distinct()
      .withColumn("is_dup", lit(1))
    v.join(dropped, Seq("vec_id"), "left")
      .withColumn("dup", coalesce(col("is_dup"), lit(0)).cast("long"))
      .groupBy("cell")
      .agg(
        count(lit(1)).as("n_vectors"),
        sum(col("dup")).as("n_dropped"),
        (count(lit(1)) - sum(col("dup"))).as("n_kept"),
        sum(when(col("dup") === 0L, col("vec_id")).otherwise(lit(0L)))
          .as("kept_id_sum"))
      .orderBy("cell")
  }

  /** [[knnIvf]] against a prebuilt cell assignment — lets callers that
    * run several IVF-backed probes ([[annRecall]]) build the centroid
    * codebook and assignment ONCE instead of once per probe.
    */
  private def knnIvfFrom(e: DataFrame, cells: DataFrame,
                         nQueries: Int, k: Int): DataFrame = {
    val vecs = e.select(col("vec_id"), dbl(col("embedding")).as("v"))
      .join(cells, "vec_id")
    val queries = vecs.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("q"), col("cell"))
    val corpus = vecs.filter(col("vec_id") >= nQueries)
      .select(col("vec_id").as("c_id"), col("v").as("c"), col("cell"))
    val w = Window.partitionBy("q_id").orderBy(desc("cos6"), asc("c_id"))
    corpus.join(queries, "cell")
      .withColumn("cos6", round(cosine(col("q"), col("c")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "c_id", "cos6", "cell")
      .orderBy("q_id", "rank")
  }

  /** Incremental IVF index maintenance — the ANN family's change-feed
    * loop: embeddings arrive as three append commits; the codebook
    * (label centroids) is FROZEN on the initial load, each later
    * batch's change feed is assigned against it (O(batch · cells)
    * work, never a re-cluster), and the (vec_id, cell) assignments
    * append to an index snapshot table. The final query is s5's probe
    * served FROM the index. The oracle recomputes the same frozen
    * codebook relationally (centroids from vec_id ≤ max/3), so the
    * compare proves: incremental assignment == one-shot assignment
    * under the same codebook, end to end through the index table.
    * At 100 TB: the nightly embedding batch joins ~|cells| centroid
    * rows and appends; the corpus is untouched.
    */
  /** INCREMENTAL [[semanticDedup]] — the maintenance shape a growing
    * corpus needs: the embedding lake lands in three commits, the cell
    * codebook is FROZEN on the initial load (re-clustering per batch
    * would silently re-shuffle existing assignments), and each batch
    * is dedup-checked against the INDEX (all prior vectors' cells) plus
    * its own lower ids — O(batch × cell-mates) per step, never a
    * corpus rescan. Because ε-dominance depends only on LOWER ids, and
    * batches arrive id-monotone, each batch's verdicts are final at
    * assignment time — so the incrementally-maintained index aggregates
    * to EXACTLY the one-shot rule under the frozen codebook, which is
    * what the oracle replays. The semantic sibling of
    * [[s9IncrementalIvf]] / `d9`/`d10`.
    */
  def sd2IncrementalSemanticDedup(s: SparkSession, d: String,
                                  tau: Double = 0.4): DataFrame = {
    import graft.sources.Snapshots
    val e = Tables.embeddings(s, d)
    val maxId = e.agg(max("vec_id")).head() match {
      case r if r.isNullAt(0) => throw new IllegalArgumentException(
        "source table is empty — nothing to cut into batches")
      case r => r.getLong(0)
    }
    val (cut1, cut2) = (maxId / 3, 2 * maxId / 3)
    val lakeDir = graft.TempDirs.create("graft-semdedup-lake")
    val indexDir = graft.TempDirs.create("graft-semdedup-index")
    Snapshots.commit(e.filter(col("vec_id") <= cut1), lakeDir, "overwrite")
    Snapshots.commit(e.filter(col("vec_id") > cut1 && col("vec_id") <= cut2),
      lakeDir, "append")
    Snapshots.commit(e.filter(col("vec_id") > cut2), lakeDir, "append")
    val centroids = codebookCentroids(
      Snapshots.readVersion(s, lakeDir, Some(0L)))
    (0L to 2L).foreach { v =>
      val batch = Snapshots.readChanges(s, lakeDir, v - 1, v)
      val bv = assignCells(centroids, batch)
        .join(batch.select(col("vec_id"), dbl(col("embedding")).as("v")),
          "vec_id")
      // lower side = every already-indexed vector (cells from the
      // index, vectors read back from the PRIOR lake version — never
      // the latest, whose files include batches not yet processed:
      // the index join would discard those rows only after scanning
      // them, an O(corpus) rescan at scale) plus the batch itself;
      // the strict id inequality keeps intra-batch pairs exact
      val lowers =
        if (v == 0L) bv.select("vec_id", "cell", "v")
        else Snapshots.readVersion(s, indexDir).select("vec_id", "cell")
          .join(Snapshots.readVersion(s, lakeDir, Some(v - 1))
            .select(col("vec_id"), dbl(col("embedding")).as("v")), "vec_id")
          .unionByName(bv.select("vec_id", "cell", "v"))
      val dropped = bv.as("t")
        .join(lowers.as("l"),
          col("l.cell") === col("t.cell") && col("l.vec_id") < col("t.vec_id"))
        .filter(round(cosine(col("l.v"), col("t.v")), 6) >= tau)
        .select(col("t.vec_id").as("vec_id")).distinct()
        .withColumn("is_dup", lit(1))
      val indexed = bv.select("vec_id", "cell")
        .join(dropped, Seq("vec_id"), "left")
        .withColumn("dup", coalesce(col("is_dup"), lit(0)).cast("long"))
        .select("vec_id", "cell", "dup")
      Snapshots.commit(indexed.coalesce(1), indexDir,
        if (v == 0L) "overwrite" else "append")
    }
    Checkpoints.unpersistCheckpoint(centroids)
    Snapshots.readVersion(s, indexDir)
      .groupBy("cell")
      .agg(
        count(lit(1)).as("n_vectors"),
        sum(col("dup")).as("n_dropped"),
        (count(lit(1)) - sum(col("dup"))).as("n_kept"),
        sum(when(col("dup") === 0L, col("vec_id")).otherwise(lit(0L)))
          .as("kept_id_sum"))
      .orderBy("cell")
  }

  def s9IncrementalIvf(s: SparkSession, d: String,
                       nQueries: Int = 8, k: Int = 3): DataFrame = {
    import graft.sources.Snapshots
    val e = Tables.embeddings(s, d)
    val maxId = e.agg(max("vec_id")).head() match {
      case r if r.isNullAt(0) => throw new IllegalArgumentException(
        "source table is empty — nothing to cut into batches")
      case r => r.getLong(0)
    }
    val (cut1, cut2) = (maxId / 3, 2 * maxId / 3)
    val lakeDir = graft.TempDirs.create("graft-incivf-lake")
    val indexDir = graft.TempDirs.create("graft-incivf-index")
    Snapshots.commit(e.filter(col("vec_id") <= cut1), lakeDir, "overwrite")
    Snapshots.commit(e.filter(col("vec_id") > cut1 && col("vec_id") <= cut2),
      lakeDir, "append")
    Snapshots.commit(e.filter(col("vec_id") > cut2), lakeDir, "append")
    // the frozen codebook's centroids are built ONCE (checkpointed)
    // and reused by every batch assignment — re-deriving them per
    // batch would triple the agg over the initial load for nothing
    val centroids = codebookCentroids(
      Snapshots.readVersion(s, lakeDir, Some(0L)))
    (0L to 2L).foreach { v =>
      val batch = Snapshots.readChanges(s, lakeDir, v - 1, v)
      // coalesce(1): a batch's (vec_id, cell) assignment is a few KB —
      // one right-sized file per commit, not one per shuffle partition
      // (table formats target file SIZE; at this scale that is 1 file)
      Snapshots.commit(assignCells(centroids, batch).coalesce(1), indexDir,
        if (v == 0) "overwrite" else "append")
    }
    Checkpoints.unpersistCheckpoint(centroids)
    val cells = Snapshots.readVersion(s, indexDir)
    val vecs = e.select(col("vec_id"), dbl(col("embedding")).as("v"))
      .join(cells, "vec_id")
    val queries = vecs.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("q"), col("cell"))
    val corpus = vecs.filter(col("vec_id") >= nQueries)
      .select(col("vec_id").as("c_id"), col("v").as("c"), col("cell"))
    val w = Window.partitionBy("q_id").orderBy(desc("cos6"), asc("c_id"))
    corpus.join(queries, "cell")
      .withColumn("cos6", round(cosine(col("q"), col("c")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "c_id", "cos6", "cell")
      .orderBy("q_id", "rank")
  }

  /** Hybrid multi-probe ANN: candidates are the UNION of the sign-LSH
    * bucket collisions (s2's probe) and the IVF cell co-residents
    * (s5's probe), exact-cosine re-ranked — the standard recall
    * booster when a single probe's blind spots matter (each probe
    * misses different neighbors; their union dominates either alone
    * at ~2× candidate cost). Both probes stay KEYED joins; the union
    * dedups (q_id, c_id) id pairs only — vectors join back by id
    * afterward, so a candidate pair costs 16 bytes in the distinct,
    * not two 64-dim vectors.
    */
  def knnHybrid(s: SparkSession, d: String, nQueries: Int = 8, k: Int = 3,
                nBits: Int = 4): DataFrame = {
    val e = Tables.embeddings(s, d)
    knnHybridFrom(e, ivfCells(e), nQueries, k, nBits)
  }

  /** [[knnHybrid]] against a prebuilt cell assignment (see
    * [[knnIvfFrom]]).
    */
  private def knnHybridFrom(e: DataFrame, cells: DataFrame, nQueries: Int,
                            k: Int, nBits: Int): DataFrame = {
    val ids = e.select(col("vec_id"),
        signBucket(col("embedding"), nBits).as("bucket"))
      .join(cells, "vec_id")
    val qIds = ids.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("bucket").as("q_bucket"),
        col("cell").as("q_cell"))
    val cIds = ids.filter(col("vec_id") >= nQueries)
      .select(col("vec_id").as("c_id"), col("bucket"), col("cell"))
    val cand = cIds.join(qIds, col("bucket") === col("q_bucket"))
      .select("q_id", "c_id")
      .union(cIds.join(qIds, col("cell") === col("q_cell"))
        .select("q_id", "c_id"))
      .distinct()
    val vecs = e.select(col("vec_id"), dbl(col("embedding")).as("v"))
    val w = Window.partitionBy("q_id").orderBy(desc("cos6"), asc("c_id"))
    cand
      .join(vecs.select(col("vec_id").as("q_id"), col("v").as("q")), "q_id")
      .join(vecs.select(col("vec_id").as("c_id"), col("v").as("c")), "c_id")
      .withColumn("cos6", round(cosine(col("q"), col("c")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "c_id", "cos6")
      .orderBy("q_id", "rank")
  }

  /** Recall@k of the approximate ANN paths (sign-LSH buckets, IVF
    * cells, their hybrid union probe, and the PQ-ADC ranker — graded
    * on its serving top-3) against exact brute-force ground truth — the quality metric that justifies an approximate
    * index: every ANN deployment reports recall next to latency, or
    * the "fast" path silently degrades as the corpus drifts. One row
    * per (method, query): hits = |approx top-k ∩ exact top-k|,
    * recall = hits/k; a query whose probe returned nothing still
    * appears (hits=0) via the truth-side scaffold, so a collapsed
    * bucket is visible, not silently absent. On this weakly-clustered
    * corpus the single probes land ~0.17 mean recall@3 and the hybrid
    * roughly doubles them — the measured case for multi-probe.
    *
    * Scale shape: ground truth is the brute-force pass, so at 100 TB
    * recall is evaluated on a bounded SAMPLE of queries (here the
    * standard 8-query set all s-queries share) — the cost profile is
    * s1's broadcast-queries scan plus two keyed probes; everything
    * downstream of the three top-k frames is k·|queries|-row joins,
    * broadcast territory at any corpus size.
    */
  def annRecall(s: SparkSession, d: String, k: Int = 3): DataFrame = {
    import s.implicits._
    // truth is s1's top-5 filtered to k, so the oracle can reuse
    // s1's SQL verbatim — which bounds the valid k
    require(k >= 1 && k <= 5, s"annRecall k must be in [1,5], got $k")
    // the IVF cell assignment (centroid build + argmax scan, the
    // harness's one corpus-scale precomputation) is shared by the ivf
    // AND hybrid probes instead of each rebuilding it
    val e = Tables.embeddings(s, d)
    val cells = ivfCells(e)
    val truth = knnBrute(s, d).filter(col("rank") <= k)
      .select("q_id", "c_id")
    val approx =
      knnBucketed(s, d, k = k)
        .select(lit("bucketed").as("method"), col("q_id"), col("c_id"))
        .unionByName(knnIvfFrom(e, cells, nQueries = 8, k = k)
          .select(lit("ivf").as("method"), col("q_id"), col("c_id")))
        .unionByName(knnHybridFrom(e, cells, nQueries = 8, k = k, nBits = 4)
          .select(lit("hybrid").as("method"), col("q_id"), col("c_id")))
        .unionByName(knnPq(s, d).filter(col("rank") <= k)
          .select(lit("pq").as("method"), col("q_id"), col("c_id")))
    val hits = approx.join(truth, Seq("q_id", "c_id"))
      .groupBy("method", "q_id").agg(count(lit(1)).as("hits"))
    truth.select("q_id").distinct()
      .crossJoin(Seq("bucketed", "hybrid", "ivf", "pq").toDF("method"))
      .join(hits, Seq("method", "q_id"), "left")
      .select(col("method"), col("q_id"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        round(coalesce(col("hits"), lit(0L)) / lit(k.toDouble), 6).as("recall"))
      .orderBy("method", "q_id")
  }

  /** Product-quantization ANN with asymmetric distance (ADC) scoring —
    * the index layout of billion-scale vector search (IVF-PQ): each
    * 64-dim vector is compressed to M=16 sub-codes (one codeword id
    * per 4-dim subspace), and queries rank candidates by summing M
    * precomputed partial dot products instead of touching raw vectors.
    * Subspace width 4 / 64 codewords is the measured recall knee on
    * this corpus: 17/24 overlap with brute-force top-5 vs 7/24 at
    * width 8 / 16 codewords (quantization error, not list length, is
    * the recall lever on weakly-clustered data).
    *
    * Codebook: the subvectors of `nCodes` deterministic SEED vectors
    * (the first corpus ids) — real-norm codewords with zero training
    * iterations to reproduce in the oracle. (Label MEANS are the wrong
    * codebook here: means of uncorrelated vectors collapse toward 0,
    * reconstructions lose all direction, and ADC ranking degenerates
    * to noise — measured recall 0. Seed subvectors keep typical norm
    * and direction; a Lloyd refinement would sharpen them further but
    * adds an iteration the oracle must replay.)
    *
    * Encoding picks, per (vector, subspace), the codeword minimizing
    * the integer-quantized squared distance Σ round((x−c)·1e6)², with
    * the argmin folded into one mergeable MIN over dist·1024+code
    * (d7's encoding trick — partial-aggregated, no window over the
    * corpus). Ranking normalizes the summed partial dots by the
    * reconstruction norm (cosine-ADC, matching the cosine the exact
    * kNN family ranks by), rounded to 6 decimals with a c_id tie-break
    * so a last-ulp difference can never flip an ordering.
    *
    * Scale shape: the codebook (nCodes·64 rows), the per-query lookup
    * table (|Q|·M·nCodes rows), and the per-codeword norm table are
    * BOUNDED and broadcast; the corpus side is a map-side probe of its
    * M codes plus one partial aggregation per (query, candidate) — the
    * corpus never shuffles its vectors, only M 12-byte code rows each,
    * and raw embeddings are never read at scoring time.
    */
  def knnPq(s: SparkSession, d: String, nQueries: Int = 8, k: Int = 3,
            nCodes: Int = 64): DataFrame = {
    val M = 16            // subspaces
    val w4 = 4            // dims per subspace
    val e = Tables.embeddings(s, d)

    // Per-subspace quantities with the subspace id as a COLUMN: the
    // (vector × codeword) frame explodes `sub` 0..M−1 first, then each
    // row evaluates a 4-term expression over dynamic-index element_at
    // — a SMALL codegen unit. (Two rejected shapes: a tall posexplode
    // + 2M-group aggregation shuffled an 8.2M-row intermediate; and
    // inlining all M subspaces into one array() projection emitted a
    // 128-round generated method past the JIT's huge-method limit, so
    // the hot loop ran interpreted — measured ~2× slower than this.)
    def idx(sub: Column, j: Int): Column = (sub * w4 + j + 1).cast("int")
    def subDot(a: Column, b: Column, sub: Column): Column =
      (0 until w4).map { j =>
        round(element_at(a, idx(sub, j)) * element_at(b, idx(sub, j))
          * lit(1000000000000.0)).cast("long")
      }.reduce(_ + _)
    def subNsq(b: Column, sub: Column): Column =
      (0 until w4).map { j =>
        val m = round(element_at(b, idx(sub, j)) * lit(1000000.0)).cast("long")
        m * m
      }.reduce(_ + _)
    val subs = explode(sequence(lit(0), lit(M - 1)))

    // codebook: the first nCodes corpus vectors, broadcast whole
    val cw = e.filter(col("vec_id") >= nQueries && col("vec_id") < nQueries + nCodes)
      .select(col("vec_id").cast("int").as("c_code"), dbl(col("embedding")).as("cvec"))
    val corpus = e.filter(col("vec_id") >= nQueries)
      .select(col("vec_id").as("c_id"), dbl(col("embedding")).as("v"))

    // corpus encoding: per (vector, subspace) argmin over codewords —
    // computed ROW-LOCALLY by the codegen'd PqEncode expression
    // against the codebook inlined as a ~32 KB literal (a bounded
    // driver collect, the same class as a broadcast dim). The prior
    // relational shape — (corpus × codewords) exploded per subspace
    // into a MIN aggregation — materialized |corpus|·nCodes·M rows
    // (20M at sf0.1) through a shuffle to answer a question each row
    // can answer alone; it was the single heaviest stage in the
    // suite (measured 3.4 s → 0.9 s whole-query from this change).
    // Arithmetic is bit-identical (see PqEncode scaladoc), so the
    // oracle hash is unchanged. Checkpointed: the scoring probe AND
    // the reconstruction-norm join both read it.
    val cwRows = cw.orderBy("c_code").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
    val enc = {
      import org.apache.spark.sql.graftbridge.Bridge
      Bridge.column(graft.functions.PqEncode(
        Bridge.expression(col("v")),
        Bridge.expression(typedLit(cwRows.map(_._2.toSeq).toSeq)),
        Bridge.expression(typedLit(cwRows.map(_._1).toSeq)), M))
    }
    val codes = corpus
      .select(col("c_id"), posexplode(enc).as(Seq("sub", "code")))
      .transform(Checkpoints.persistFrame)
    // per-(subspace, codeword) squared norm in micro² units — nCodes·M
    // rows, straight projection off the broadcast codebook
    val nsq = cw.withColumn("n_sub", subs)
      .select(col("c_code").as("n_code"), col("n_sub"),
        subNsq(col("cvec"), col("n_sub")).as("cw_nsq"))
    val recon = codes.join(broadcast(nsq),
        codes("sub") === nsq("n_sub") && codes("code") === nsq("n_code"))
      .groupBy("c_id").agg(sum("cw_nsq").as("recon_nsq"))
    // ADC lookup table: partial dot of each query subvector with each
    // codeword — |Q|·M·nCodes rows, a projection of the (query ×
    // codeword) frame, broadcast
    val lut = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), dbl(col("embedding")).as("q"))
      .join(broadcast(cw))
      .withColumn("q_sub", subs)
      .select(col("q_id"), col("c_code"), col("q_sub"),
        subDot(col("q"), col("cvec"), col("q_sub")).as("pdot"))
    val w = Window.partitionBy("q_id").orderBy(desc("score6"), asc("c_id"))
    codes.join(broadcast(lut),
        codes("sub") === lut("q_sub") && codes("code") === lut("c_code"))
      .groupBy("q_id", "c_id")
      .agg(sum("pdot").as("adc"))
      .join(recon, "c_id")
      .withColumn("score6",
        round(col("adc") /
          (lit(1000000.0) * sqrt(greatest(col("recon_nsq"), lit(1L)).cast("double"))), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "c_id", "score6")
      .orderBy("q_id", "rank")
  }

  /** Int8 scalar quantization per vector — the storage/serving prep
    * step that shrinks an embedding corpus 4× (float32 → int8) before
    * ANN indexing. Per vector: elements quantized to exact integer
    * micro-units (round(x·1e6), the labelCentroids trick), then
    * max-abs-scaled to int8 as floor(micro·127 / maxabs_micro) — the
    * numerator is an exact long, the division is one correctly-rounded
    * IEEE op, and floor of a correctly-rounded double is
    * engine-identical, so every quantized value is bit-identical in the
    * oracle with no float-sum order hazard anywhere. Output is the
    * per-vector manifest: L2 norm in exact micro-unit² space, the
    * scale, and integer checksums (sum, |sum|, position-weighted dot)
    * that pin the full quantized vector under the hash compare.
    * Shape: posexplode (64 rows per vector) → partial-aggregated
    * groupBy(vec_id) — groups are vector-sized, no skew, linear at
    * 100 TB.
    */
  def quantizeEmbeddings(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"),
        transform(col("embedding"),
          x => round(x.cast("double") * lit(1000000.0)).cast("long")).as("micro"))
      // per-vector scale from the array itself — no self-join back onto
      // an exploded frame (that shape would re-shuffle the corpus on
      // vec_id just to rejoin a scalar each row already owns)
      .withColumn("maxabs_micro", array_max(transform(col("micro"), abs(_))))
      .select(col("vec_id"), col("maxabs_micro"),
        posexplode(col("micro")).as(Seq("pos", "m")))
      // greatest(·,1) guards the all-zero vector: 0/0 would be NaN, and
      // NaN→BIGINT casts diverge between engines (the quantized values
      // are all zero then anyway, so the guard changes nothing else)
      .withColumn("q",
        floor((col("m") * 127L).cast("double") /
          greatest(col("maxabs_micro"), lit(1L))).cast("long"))
      .groupBy("vec_id", "maxabs_micro")
      .agg(
        count(lit(1)).cast("int").as("dim"),
        sum(col("m") * col("m")).as("norm_sq_micro"),
        sum("q").as("q_sum"),
        sum(abs(col("q"))).as("q_abs_sum"),
        sum(col("q") * (col("pos") + 1)).as("q_dot"))
      .select("vec_id", "dim", "maxabs_micro", "norm_sq_micro",
        "q_sum", "q_abs_sum", "q_dot")
      .orderBy("vec_id")

  /** Per-label centroids in tall form (label, dim, mean). Elements are
    * quantized to integer micro-units (round(x·1e6)) before summing:
    * integer sums are exact, so the mean is independent of row order and
    * partitioning — deterministic at any scale, and hash-identical in
    * the oracle. (A DECIMAL cast of an arbitrary float is NOT safe: the
    * engines' float→decimal rounding paths can differ by one ulp.)
    */
  def labelCentroids(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .filter(col("pos") < 4) // keep output compact: leading 4 dims
      .withColumn("micro",
        round(col("x").cast("double") * lit(1000000.0)).cast("long"))
      .groupBy("label", "pos")
      .agg(
        (sum(col("micro")).cast("double") / lit(1000000.0) / count(lit(1)))
          .as("mean"),
        count(lit(1)).as("n"))
      .orderBy("label", "pos")
}
