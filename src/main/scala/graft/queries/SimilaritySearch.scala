package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{Similarity, VectorFunctions}
import graft.sources.Tables

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`embedding: array<float>`, 64-dim).
  *
  * Two paths, matching the brief:
  *  - brute-force cosine top-k: the correctness baseline. The query set is
  *    broadcast (it's small by construction); candidates never shuffle — each
  *    partition scores its local vectors against all queries map-side, and
  *    only k rows per (query, partition) survive into the final top-k, so the
  *    shuffle is O(queries × k × partitions), not O(n).
  *  - sign-LSH bucketed: the 100 TB path. Deterministic hyperplanes put each
  *    vector in 1 of 2^8 buckets; queries probe only their own bucket —
  *    turning ANN into an equi-join on bucket id. Recall is tunable via
  *    planes/probes; precision is exact (real cosine on candidates).
  */
object SimilaritySearch {

  private[graft] val K = 5
  private[graft] val NQueries = 10

  /** Shipped ANN parameters — single source of truth shared with
    * [[DataPipeline.methodCard]] so the published caveat card cannot drift
    * from the code that runs. The recall floors are the values the LlmOpsSpec
    * brute-force differentials assert. */
  private[graft] val LshBands = 4
  private[graft] val LshPlanesPerBand = 4
  private[graft] val LshNProbe = 6
  private[graft] val LshSpecRecallFloor = 0.85
  private[graft] val IvfNCells = 16
  private[graft] val IvfNProbe = 4
  private[graft] val IvfSpecRecallFloor = 0.2

  /** The parsed (vec_id, v: array<double>) frame every ANN method starts
    * from. Split out so [[simRecallReport]] can parse ONCE and share the
    * materialized frame across its four methods (r13 optimization, guide
    * §1.2/§5: each method referenced the parse 2-4 times and Spark
    * recomputes every reference — the report paid ~10 parse pipelines for
    * one corpus). */
  private[graft] def parsedVecs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, dir)
      .select($"vec_id", Similarity.toDoubleArray($"embedding").as("v"))
  }

  /** Brute-force exact top-k neighbors for the first `NQueries` vectors. */
  def simBruteforceTopk(spark: SparkSession, dir: String): DataFrame =
    simBruteforceTopkOnVecs(parsedVecs(spark, dir))

  private[graft] def simBruteforceTopkOnVecs(vecs: DataFrame): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val queries = vecs.filter($"vec_id" < NQueries)
      .select($"vec_id".as("query_id"), $"v".as("q"))
    val scored = vecs.join(broadcast(queries), $"vec_id" =!= $"query_id")
      .withColumn("cos", VectorFunctions.cosineSim($"q", $"v"))
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"vec_id")
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= K)
      .select($"query_id", $"vec_id".as("neighbor_id"),
        $"rank".cast("long").as("rank"), round($"cos", 4).as("cosine"))
      .orderBy($"query_id", $"rank")
  }

  /** DuckDB oracle: same exact top-k via list_cosine_similarity on
    * double-cast lists (both engines then accumulate in double, in the same
    * element order → identical values). */
  val simBruteforceTopkSql: String =
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    list_cosine_similarity(q.emb, c.emb) AS cos
       |  FROM v q JOIN v c ON c.vec_id <> q.vec_id
       |  WHERE q.vec_id < $NQueries),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, rank, round(cos, 4) AS cosine
       |FROM ranked WHERE rank <= $K
       |ORDER BY query_id, rank""".stripMargin

  /** LSH-bucketed ANN with multi-probe queries: the index holds one exact
    * sign-LSH key per band; each query probes its own bucket PLUS the buckets
    * reached by flipping its lowest-margin hyperplane bits (multi-probe LSH —
    * recall comes from extra query probes, not a bigger index).
    * Oracle-checked since r9 ([[simLshTopkSql]] re-derives banding AND the
    * multi-probe mask ranking); LlmOpsSpec pins exact candidate scores and
    * recall ≥ 0.8 vs brute force. */
  def simLshTopk(spark: SparkSession, dir: String): DataFrame =
    simLshTopkTuned(spark, dir, nProbe = LshNProbe)

  /** nProbe exposed for tuning/specs; see [[simLshTopk]] for the shipped
    * configuration. */
  def simLshTopkTuned(spark: SparkSession, dir: String, nProbe: Int): DataFrame =
    simLshTopkOnVecs(parsedVecs(spark, dir), nProbe)

  private[graft] def simLshTopkOnVecs(base: DataFrame, nProbe: Int): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    val vecs = base
      .select($"vec_id",
        explode(Similarity.signLshBands($"v", nBands = LshBands,
          planesPerBand = LshPlanesPerBand, dim = 64)).as("bk"))
      .select($"vec_id", $"bk.band".as("band"), $"bk.key".as("key"))
    // probe keys within a band are pairwise distinct by construction (exact
    // key + distinct XOR masks) and the band id separates bands — no dedup
    // needed before the broadcast
    val queryBands = base.filter($"vec_id" < NQueries)
      .select($"vec_id".as("query_id"),
        explode(Similarity.signLshProbeBands($"v", nBands = LshBands,
          planesPerBand = LshPlanesPerBand, dim = 64, nProbe = nProbe)).as("bk"))
      .select($"bk.band".as("band"), $"bk.key".as("key"), $"query_id")
    // ids-only probe join, dedup multi-band collisions, THEN fetch vectors
    // and score once per candidate with the codegen'd kernel
    val candIds = vecs
      .join(broadcast(queryBands), Seq("band", "key"))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id").distinct()
    val candidates = candIds
      .join(base.select($"vec_id".as("query_id"), $"v".as("q")), "query_id")
      .join(base, "vec_id")
      .withColumn("cos", VectorFunctions.cosineSim($"q", $"v"))
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"vec_id")
    candidates.withColumn("rank", row_number().over(w))
      .filter($"rank" <= K)
      .select($"query_id", $"vec_id".as("neighbor_id"),
        $"rank".cast("long").as("rank"), round($"cos", 4).as("cosine"))
      .orderBy($"query_id", $"rank")
  }

  /** Pairwise label-centroid similarity: per-label mean embedding, then all
    * centroid pairs' cosine — a "cluster compactness" style diagnostic.
    * Mean = sum/count with fixed rounding → oracle-checkable. */
  def simLabelCentroids(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val byDim = Tables.embeddings(spark, dir)
      .select($"label", posexplode(Similarity.toDoubleArray($"embedding")))
      .toDF("label", "dim", "x")
      .groupBy($"label", $"dim")
      .agg(round(avg($"x"), 8).as("m"))
    byDim.groupBy($"label")
      .agg(round(sqrt(sum($"m" * $"m")), 6).as("centroid_norm"),
        count(lit(1)).as("n_dims"))
      .orderBy($"label")
  }

  // avg then aggressive rounding (1e-8 grid) before the norm keeps both
  // engines' floating error (~1e-13 on 64-dim sums of ~100 values) far from
  // the rounding boundary; the final norm is then bitwise identical.
  val simLabelCentroidsSql: String =
    """WITH byd AS (
      |  SELECT label, d.i AS dim, round(avg(emb[d.i]), 8) AS m
      |  FROM (SELECT label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
      |       LATERAL (SELECT unnest(range(1, 65)) AS i) d
      |  GROUP BY label, d.i)
      |SELECT label, round(sqrt(sum(m * m)), 6) AS centroid_norm,
      |  count(*) AS n_dims
      |FROM byd
      |GROUP BY label
      |ORDER BY label""".stripMargin

  /** LITERAL-INLINED cell scores: one codegen'd cosine per centroid, the
    * codebook expanded into the expression tree as `array(lit...)`. Retained
    * ONLY as the reference implementation for the differential spec — the
    * production path is [[VectorFunctions.codebookTopCells]], which attaches
    * the codebook as a plan reference object so generated-code size is
    * constant in nCells. This form generates O(nCells · dim) code and would
    * cross Janino's 64 KB method limit around nCells ≈ 100. */
  private[graft] def cellScoresFor(codebook: Array[Array[Double]])(
      v: org.apache.spark.sql.Column): org.apache.spark.sql.Column = array(
    codebook.zipWithIndex.map { case (c, i) =>
      struct(VectorFunctions.cosineSim(v, array(c.map(lit).toSeq: _*)).as("s"),
        lit(i).as("cell"))
    }.toSeq: _*)

  /** Spherical k-means codebook trained IN the engine: deterministic
    * first-`nCells` seed, then `iters` Lloyd rounds — assign every vector to
    * its max-cosine centroid (one codegen'd codebook kernel per row,
    * [[graft.functions.CodebookTopCells]]),
    * take per-cell per-dimension means via posexplode + hash aggregate
    * (partial aggregation collapses each executor's contribution to
    * nCells×dim cells, so shuffle volume is O(executors × nCells × dim)
    * regardless of corpus size), L2-normalize the means (the spherical
    * step — cosine argmax against a normalized centroid ≡ dot-product
    * argmax). Driver state per round is ONE nCells×dim collect, the same
    * bounded footprint as loading an offline codebook; empty cells keep
    * their previous centroid. Lloyd monotonicity (mean max-cosine never
    * decreases) is spec-pinned. [[simIvfTopk]] itself inlines the seed
    * codebook so its bench line stays training-free — the production shape
    * trains out-of-band (this function, or offline) and broadcasts. */
  private[graft] def trainIvfCodebook(spark: SparkSession, dir: String,
      nCells: Int, iters: Int): Array[Array[Double]] = {
    import spark.implicits._
    trainIvfCodebookOn(
      Tables.embeddings(spark, dir)
        .select($"vec_id", Similarity.toDoubleArray($"embedding").as("r")),
      nCells, iters)
  }

  /** [[trainIvfCodebook]] over an explicit (vec_id, r: array<double>)
    * frame — the face [[IvfIndex.reindexIvf]] trains through, where the
    * corpus comes from the index's own cells store instead of the
    * embeddings table. Seeding takes the `nCells` smallest vec_ids (≡ the
    * `vec_id < nCells` seed on dense-id tables, still deterministic on
    * sparse ones). */
  private[graft] def trainIvfCodebookOn(raw: DataFrame,
      nCells: Int, iters: Int): Array[Array[Double]] = {
    val spark = raw.sparkSession
    import spark.implicits._
    // train on L2-NORMALIZED vectors: cosine assignment is scale-invariant,
    // but the update step's optimum for the spherical objective is the
    // normalized mean of normalized members — averaging raw vectors would
    // weight members by their norms and break Lloyd monotonicity
    val norm = sqrt(VectorFunctions.dotProduct($"r", $"r"))
    val vecs = raw.select($"vec_id",
      when(norm > 0, transform($"r", x => x / norm)).otherwise($"r").as("v"))
    var codebook = vecs.orderBy($"vec_id").limit(nCells).orderBy($"vec_id")
      .collect()
      .map(_.getSeq[Double](1).toArray)
    for (_ <- 1 to iters) {
      val cell = element_at(
        VectorFunctions.codebookTopCells($"v", codebook, nTop = 1), 1)
      val means = vecs
        .select(cell.as("cell"), posexplode($"v").as(Seq("pos", "x")))
        .groupBy($"cell", $"pos").agg(avg($"x").as("m"))
        .collect()
      val next = codebook.map(_.clone())
      means.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
      codebook = next.map { c =>
        val n = math.sqrt(c.map(x => x * x).sum)
        if (n > 0) c.map(_ / n) else c
      }
    }
    codebook
  }

  /** IVF-style ANN: a coarse codebook partitions vectors into inverted cells
    * (assignment = nearest centroid); queries probe only their `nprobe`
    * nearest cells. The other classic scale path next to sign-LSH: cells
    * bound candidate counts regardless of corpus size, and the cell id is an
    * equi-join key (one shuffle).
    *
    * The codebook here is the first `nCells` vectors — the deterministic
    * SEED of [[trainIvfCodebook]], untrained so the bench line prices the
    * query, not the training. Assignment and probing use ONE codegen'd
    * kernel ([[graft.functions.CodebookTopCells]]) that carries the codebook
    * as a plan reference object — generated-code size is constant in nCells,
    * so a production codebook (nCells 256–4096) compiles exactly like this
    * 16-cell one (spec-pinned at nCells = 256 in LlmOpsSpec). At 100 TB the
    * codebook is trained out-of-band (in-engine via [[trainIvfCodebook]], or
    * offline) and rides the serialized plan to executors, exactly the shape
    * used here. Oracle-checked since r9 ([[simIvfTopkSql]] re-derives the
    * kernel's arithmetic in DuckDB); LlmOpsSpec pins exact scores, recall
    * vs brute force, kernel-vs-literal-path equivalence, and Lloyd
    * monotonicity for the trainer.
    *
    * Note the per-row cell scoring is NOT evaluated twice over the corpus:
    * the probe branch filters to the NQueries query rows before scoring;
    * only those ~50 rows are scored in both branches. */
  def simIvfTopk(spark: SparkSession, dir: String): DataFrame =
    simIvfTopkOnVecs(parsedVecs(spark, dir))

  private[graft] def simIvfTopkOnVecs(vecs: DataFrame): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val nCells = IvfNCells
    val nprobe = IvfNProbe
    // coarse codebook: collected once, tiny (nCells x 64 doubles), attached
    // to the scoring kernel as a reference object — assignment stays a pure
    // map-side projection with constant-size generated code
    val codebook = vecs.filter($"vec_id" < nCells)
      .orderBy($"vec_id").collect()
      .map(r => r.getSeq[Double](1).toArray)
    val assigned = vecs.withColumn("cell",
      element_at(VectorFunctions.codebookTopCells($"v", codebook, nTop = 1), 1))
    val queryProbes = vecs.filter($"vec_id" < NQueries)
      .select($"vec_id".as("query_id"),
        explode(VectorFunctions.codebookTopCells($"v", codebook, nprobe)).as("cell"))
    val candIds = assigned.select($"cell", $"vec_id")
      .join(broadcast(queryProbes), "cell")
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id").distinct()
    val candidates = candIds
      .join(vecs.select($"vec_id".as("query_id"), $"v".as("q")), "query_id")
      .join(vecs, "vec_id")
      .withColumn("cos", VectorFunctions.cosineSim($"q", $"v"))
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"vec_id")
    candidates.withColumn("rank", row_number().over(w))
      .filter($"rank" <= K)
      .select($"query_id", $"vec_id".as("neighbor_id"),
        $"rank".cast("long").as("rank"), round($"cos", 4).as("cosine"))
      .orderBy($"query_id", $"rank")
  }

  /** IVF-PQ parameters — M subspaces × ks centroids each over the 64-dim
    * embeddings, FAISS-IVFPQ's shape: codes are M bytes per vector (here
    * M ints for parquet simplicity; a production sink packs them). */
  private[graft] val PqM = 8
  private[graft] val PqKs = 16
  private[graft] val PqShortlist = 30

  /** IVF-PQ ANN — the classic composed production index: IVF cells bound the
    * candidate set, PRODUCT-QUANTIZED codes make scoring each candidate M
    * table lookups instead of a dim-length float scan, and an fp32 exact
    * re-rank fixes the final order. Completes the family: sign-LSH
    * ([[simLshTopk]]), IVF-flat ([[simIvfTopk]]), SQ8 ([[simQuantizedTopk]]),
    * two-stage re-rank ([[simQuantizedRerank]]).
    *
    * Structure (every step a projection or an equi-join):
    *  1. encode: one coarse-cell id + M per-subspace PQ codes per vector —
    *     M+1 constant-size [[graft.functions.CodebookTopCells]] kernel calls
    *     (codebooks ride as plan reference objects; generated code is
    *     constant in nCells/ks — the broadcast-codebook discipline).
    *     At 100 TB this encoded (cell, codes) table is what you materialize:
    *     4+M·1 bytes/vector ≈ 3% of the fp32 corpus, and the only thing the
    *     query-time scan reads.
    *  2. probe: queries explode to their nprobe nearest cells; candidates =
    *     cell equi-join (each candidate owns ONE cell, so no dedup round —
    *     cheaper than the LSH multi-band probe).
    *  3. ADC: per (query, candidate), Σ_m table[m·ks + code_m] via ONE
    *     codegen'd lookup kernel; the query's M×ks dot-product table is an
    *     array COLUMN on the broadcast query side — per-query data, zero
    *     per-query codegen, same scale argument as the codebook kernel.
    *  4. shortlist + fp32 re-rank: top-[[PqShortlist]] by ADC rejoin the
    *     fp32 vectors for exact cosine — the [[simQuantizedRerank]] stage-2
    *     shape; the fp32 corpus serves vec_id point lookups only.
    *
    * Codebooks are deterministic seeds (first rows' vectors / subvectors —
    * the training-free discipline of [[simIvfTopk]]; [[trainIvfCodebook]]
    * shows the in-engine Lloyd path that would refine them out-of-band).
    * Driver state: nCells·64 + M·ks·8 + NQueries·64 doubles — bounded,
    * independent of corpus size. Code assignment is per-subspace cosine
    * argmax (direction-only); magnitude error is absorbed by the exact
    * re-rank stage, and recall vs brute force is spec-pinned in LlmOpsSpec.
    *
    * Oracle-checked since r9 ([[simIvfPqTopkSql]]): the earlier "re-
    * implementing the kernel in SQL pins nothing" argument was wrong —
    * matching the kernel's exact arithmetic ORDER in an independent
    * engine pins precisely the claim that matters (same codes → same
    * shortlist → same top-k), and the r9 sim_* promotions showed the
    * order can be matched. LlmOpsSpec keeps the recall and
    * kernel-equivalence differentials. */
  def simIvfPqTopk(spark: SparkSession, dir: String): DataFrame =
    simIvfPqTopkOnVecs(parsedVecs(spark, dir))

  private[graft] def simIvfPqTopkOnVecs(vecs: DataFrame): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val dim = 64
    val dsub = dim / PqM
    val seed = vecs.filter($"vec_id" < math.max(IvfNCells, PqKs))
      .orderBy($"vec_id").collect().map(_.getSeq[Double](1).toArray)
    val coarse = seed.take(IvfNCells)
    val sub = Array.tabulate(PqM)(m =>
      seed.take(PqKs).map(_.slice(m * dsub, (m + 1) * dsub)))
    val codeCols = (0 until PqM).map { m =>
      element_at(VectorFunctions.codebookTopCells(
        slice($"v", m * dsub + 1, dsub), sub(m), nTop = 1), 1)
    }
    val encoded = vecs.select($"vec_id",
      element_at(VectorFunctions.codebookTopCells($"v", coarse, nTop = 1), 1).as("cell"),
      array(codeCols: _*).as("codes"))
    // per-query ADC tables: M×ks dot products, built once from the collected
    // query vectors (NQueries×dim doubles — bounded driver state) and joined
    // in as DATA on the broadcast side
    val qTables = vecs.filter($"vec_id" < NQueries).orderBy($"vec_id")
      .collect().map { r =>
        val q = r.getSeq[Double](1).toArray
        val t = new Array[Double](PqM * PqKs)
        var m = 0
        while (m < PqM) {
          var j = 0
          while (j < PqKs) {
            var d = 0.0
            var i = 0
            while (i < dsub) { d += q(m * dsub + i) * sub(m)(j)(i); i += 1 }
            t(m * PqKs + j) = d
            j += 1
          }
          m += 1
        }
        (r.getLong(0), t)
      }.toSeq.toDF("query_id", "tbl")
    val queryProbes = vecs.filter($"vec_id" < NQueries)
      .select($"vec_id".as("query_id"),
        explode(VectorFunctions.codebookTopCells($"v", coarse, IvfNProbe)).as("cell"))
    // each candidate owns exactly one cell and a query's probe cells are
    // distinct -> (query, candidate) pairs are already unique
    val adc = encoded.join(broadcast(queryProbes), "cell")
      .filter($"vec_id" =!= $"query_id")
      .join(broadcast(qTables), "query_id")
      .withColumn("adc", VectorFunctions.pqAdcScore($"codes", $"tbl", PqKs))
    val w1 = Window.partitionBy($"query_id").orderBy($"adc".desc, $"vec_id")
    val shortlist = adc.withColumn("qrank", row_number().over(w1))
      .filter($"qrank" <= PqShortlist)
      .select($"query_id", $"vec_id")
    val w2 = Window.partitionBy($"query_id").orderBy($"cos".desc, $"vec_id")
    shortlist
      .join(vecs.select($"vec_id".as("query_id"), $"v".as("q")), "query_id")
      .join(vecs, "vec_id")
      .withColumn("cos", VectorFunctions.cosineSim($"q", $"v"))
      .withColumn("rank", row_number().over(w2))
      .filter($"rank" <= K)
      .select($"query_id", $"vec_id".as("neighbor_id"),
        $"rank".cast("long").as("rank"), round($"cos", 4).as("cosine"))
      .orderBy($"query_id", $"rank")
  }

  /** Metadata-filtered vector search: exact top-k over the subset of vectors
    * whose `label` passes a predicate (the RAG "filtered retrieval" shape).
    * The filter is applied BEFORE scoring (pre-filter), which is the only
    * order that survives scale: post-filtering a top-k can return < k rows
    * however large k' is inflated, and it scores candidates the predicate
    * would have discarded. The filter also reaches the parquet scan as a
    * pushed predicate — at 100 TB with label-partitioned or z-ordered layout
    * (see [[graft.sources.Layout]]) it prunes whole files before any vector
    * is read. Shuffle shape is identical to [[simBruteforceTopk]]: queries
    * broadcast, per-partition top-k, O(queries × k × partitions) shuffle. */
  def simFilteredTopk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.embeddings(spark, dir)
      .select($"vec_id", $"label", Similarity.toDoubleArray($"embedding").as("v"))
    val queries = base.filter($"vec_id" < NQueries)
      .select($"vec_id".as("query_id"), $"v".as("q"))
    val candidates = base.filter($"label".isin(1, 3, 5))
    val scored = candidates.join(broadcast(queries), $"vec_id" =!= $"query_id")
      .withColumn("cos", VectorFunctions.cosineSim($"q", $"v"))
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"vec_id")
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= K)
      .select($"query_id", $"vec_id".as("neighbor_id"), $"label",
        $"rank".cast("long").as("rank"), round($"cos", 4).as("cosine"))
      .orderBy($"query_id", $"rank")
  }

  val simFilteredTopkSql: String =
    s"""WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label,
       |    list_cosine_similarity(q.emb, c.emb) AS cos
       |  FROM v q JOIN v c ON c.vec_id <> q.vec_id
       |  WHERE q.vec_id < $NQueries AND c.label IN (1, 3, 5)),
       |ranked AS (
       |  SELECT query_id, neighbor_id, label, cos,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, label, rank, round(cos, 4) AS cosine
       |FROM ranked WHERE rank <= $K
       |ORDER BY query_id, rank""".stripMargin

  /** Int8 scalar-quantized top-k: vectors are quantized once
    * (q_i = round(x_i · 127/max|x|), a codegen'd kernel), candidates are
    * scored by the EXACT INTEGER dot product of the quantized vectors, then
    * ranked by the dequantized score qdot · m_a · m_b / 127² — FAISS `SQ8`
    * scoring (the per-vector scales must rejoin the score, or large-norm
    * candidates are systematically under-ranked). The trade: 4× less
    * candidate-fetch bandwidth (int8 vs fp32) and an integer inner loop, for
    * a sub-percent score perturbation vs the exact dot (pinned by
    * LlmOpsSpec). Deterministic cross-engine with no rounding grid on the
    * sort key: qdot is an exact integer and the dequantization multiplies
    * bitwise-identical doubles in the same left-to-right order. At 100 TB
    * the quantized column is what you'd materialize next to the fp32 source
    * of truth; re-ranking survivors with [[VectorFunctions.cosineSim]] on
    * the fp32 vectors is the standard second stage (shape shown by the
    * candIds → rejoin pattern in [[simLshTopkTuned]]). */
  def simQuantizedTopk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.embeddings(spark, dir)
      .select($"vec_id", Similarity.toDoubleArray($"embedding").as("v"))
      .select($"vec_id",
        VectorFunctions.quantizeInt8($"v").as("qv"),
        VectorFunctions.maxAbs($"v").as("m"))
    val queries = base.filter($"vec_id" < NQueries)
      .select($"vec_id".as("query_id"), $"qv".as("qq"), $"m".as("mq"))
    val scored = base.join(broadcast(queries), $"vec_id" =!= $"query_id")
      .withColumn("qdot", VectorFunctions.dotInt($"qq", $"qv"))
      .withColumn("score", $"qdot".cast("double") * $"mq" * $"m" / lit(16129.0))
    val w = Window.partitionBy($"query_id").orderBy($"score".desc, $"vec_id")
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= K)
      .select($"query_id", $"vec_id".as("neighbor_id"),
        $"rank".cast("long").as("rank"), $"qdot", round($"score", 4).as("score"))
      .orderBy($"query_id", $"rank")
  }

  // CASE guard: an all-zero vector quantizes to all zeros on both sides
  // (kernel: m=0 branch; oracle: scale=0 so round(x*0)=0) instead of the
  // unguarded 127/0 = inf -> NaN cast failure. The dequantized sort key
  // multiplies qdot*mq*m/16129.0 in the engine's left-to-right association.
  val simQuantizedTopkSql: String =
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |s AS (SELECT vec_id, emb,
       |        list_max(list_transform(emb, x -> abs(x))) AS m,
       |        CASE WHEN list_max(list_transform(emb, x -> abs(x))) > 0
       |             THEN 127.0 / list_max(list_transform(emb, x -> abs(x)))
       |             ELSE 0.0 END AS scale
       |      FROM v),
       |q AS (SELECT vec_id, m,
       |        list_transform(emb, x -> CAST(round(x * scale) AS INTEGER)) AS qv
       |      FROM s),
       |scored AS (
       |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |    CAST(list_dot_product(CAST(a.qv AS DOUBLE[]), CAST(b.qv AS DOUBLE[])) AS BIGINT) AS qdot,
       |    CAST(list_dot_product(CAST(a.qv AS DOUBLE[]), CAST(b.qv AS DOUBLE[])) AS BIGINT)
       |      * a.m * b.m / 16129.0 AS score
       |  FROM q a JOIN q b ON b.vec_id <> a.vec_id
       |  WHERE a.vec_id < $NQueries),
       |ranked AS (
       |  SELECT query_id, neighbor_id, qdot, score,
       |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, rank, qdot, round(score, 4) AS score
       |FROM ranked WHERE rank <= $K
       |ORDER BY query_id, rank""".stripMargin

  /** Two-stage retrieval: int8 shortlist → fp32 exact re-rank — the standard
    * production shape around scalar quantization (the quantized column is
    * the cheap first pass; survivors re-score against the fp32 source of
    * truth). Stage 1 takes the top `Shortlist` per query by dequantized
    * int8 score (WindowGroupLimit — bounded state); stage 2 rejoins ONLY
    * those ids to the fp32 vectors and ranks the exact cosine. At 100 TB
    * the shortlist rejoin touches `queries × Shortlist` rows — the fp32
    * corpus never re-scans for scoring, it serves point lookups keyed on
    * vec_id. Fully deterministic both stages → DuckDB-oracle-checked, and
    * the spec pins that re-ranking recovers exact-cosine order where the
    * quantized order differs. */
  private[graft] val Shortlist = 20

  def simQuantizedRerank(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.embeddings(spark, dir)
      .select($"vec_id", Similarity.toDoubleArray($"embedding").as("v"))
    val quant = base.select($"vec_id",
      VectorFunctions.quantizeInt8($"v").as("qv"),
      VectorFunctions.maxAbs($"v").as("m"))
    val queries = quant.filter($"vec_id" < NQueries)
      .select($"vec_id".as("query_id"), $"qv".as("qq"), $"m".as("mq"))
    val w1 = Window.partitionBy($"query_id").orderBy($"qscore".desc, $"vec_id")
    val shortlist = quant.join(broadcast(queries), $"vec_id" =!= $"query_id")
      .withColumn("qscore",
        VectorFunctions.dotInt($"qq", $"qv").cast("double") * $"mq" * $"m" / lit(16129.0))
      .withColumn("qrank", row_number().over(w1))
      .filter($"qrank" <= Shortlist)
      .select($"query_id", $"vec_id")
    val w2 = Window.partitionBy($"query_id").orderBy($"cos".desc, $"vec_id")
    shortlist
      .join(base.select($"vec_id".as("query_id"), $"v".as("q")), "query_id")
      .join(base, "vec_id")
      .withColumn("cos", VectorFunctions.cosineSim($"q", $"v"))
      .withColumn("rank", row_number().over(w2))
      .filter($"rank" <= K)
      .select($"query_id", $"vec_id".as("neighbor_id"),
        $"rank".cast("long").as("rank"), round($"cos", 4).as("cosine"))
      .orderBy($"query_id", $"rank")
  }

  val simQuantizedRerankSql: String =
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |s AS (SELECT vec_id, emb,
       |        list_max(list_transform(emb, x -> abs(x))) AS m,
       |        CASE WHEN list_max(list_transform(emb, x -> abs(x))) > 0
       |             THEN 127.0 / list_max(list_transform(emb, x -> abs(x)))
       |             ELSE 0.0 END AS scale
       |      FROM v),
       |q AS (SELECT vec_id, emb, m,
       |        list_transform(emb, x -> CAST(round(x * scale) AS INTEGER)) AS qv
       |      FROM s),
       |stage1 AS (
       |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |    row_number() OVER (PARTITION BY a.vec_id ORDER BY
       |      CAST(list_dot_product(CAST(a.qv AS DOUBLE[]), CAST(b.qv AS DOUBLE[])) AS BIGINT)
       |        * a.m * b.m / 16129.0 DESC, b.vec_id) AS qrank
       |  FROM q a JOIN q b ON b.vec_id <> a.vec_id
       |  WHERE a.vec_id < $NQueries),
       |short AS (SELECT query_id, neighbor_id FROM stage1 WHERE qrank <= $Shortlist),
       |stage2 AS (
       |  SELECT sh.query_id, sh.neighbor_id,
       |    list_cosine_similarity(qa.emb, vb.emb) AS cos
       |  FROM short sh
       |  JOIN v qa ON qa.vec_id = sh.query_id
       |  JOIN v vb ON vb.vec_id = sh.neighbor_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM stage2)
       |SELECT query_id, neighbor_id, rank, round(cos, 4) AS cosine
       |FROM ranked WHERE rank <= $K
       |ORDER BY query_id, rank""".stripMargin

  /** ANN quality-evaluation harness as a first-class operator: recall@K
    * of every approximate method against the exact brute-force answer, per
    * query and aggregated — the report a team runs before (and after every
    * reindex of) shipping an ANN path, here runnable on the production
    * engine itself instead of a side notebook. The per-method recall
    * floors the specs assert are exactly these numbers; the methodCard
    * honesty discipline, applied to retrieval.
    *
    * Scale shape: each method's top-K frame is NQueries×K rows — the
    * comparison join and report aggregate are query-table-sized, trivially
    * broadcastable; the only real cost is running the methods themselves.
    * Oracle-checked since r9 ([[simRecallReportSql]] composes the four
    * method twins and re-derives hits/K — promotable exactly because the
    * r9 sim_* SQL twins made every method's top-K expressible, and the
    * report carries no timings, only set overlap). */
  def simRecallReport(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // ONE parse of the corpus shared by all four methods (r13): each method
    // references its vecs frame 2-4 times and Spark recomputes every
    // reference, so without this the report re-ran the embedding parse ~10x.
    // localCheckpoint materializes the parsed frame eagerly INSIDE the timed
    // computation — intra-query reuse, not cross-run caching.
    val vecs = parsedVecs(spark, dir).localCheckpoint(true)
    val brute = simBruteforceTopkOnVecs(vecs)
      .select($"query_id", $"neighbor_id").localCheckpoint(true)
    val queryIds = brute.select($"query_id").distinct()
    def per(method: String, ann: DataFrame): DataFrame = {
      val hits = ann.select($"query_id", $"neighbor_id")
        .join(brute, Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy($"query_id").agg(count(lit(1)).as("hits"))
      queryIds.join(hits, Seq("query_id"), "left")
        .select($"query_id",
          (coalesce($"hits", lit(0L)).cast("double") / K).as("recall"))
        .agg(count(lit(1)).as("n_queries"),
          round(avg($"recall"), 4).as("mean_recall"),
          round(min($"recall"), 4).as("min_recall"))
        .select(lit(method).as("method"), $"n_queries",
          $"mean_recall", $"min_recall")
    }
    // the report is 3 rows: checkpoint it and RELEASE the corpus-scale
    // parse/bruteforce blocks deterministically (r14 §5) — lingering
    // checkpoint storage measurably degraded unrelated later queries in a
    // long-lived bench JVM
    val report = per("lsh", simLshTopkOnVecs(vecs, nProbe = LshNProbe))
      .unionAll(per("ivf", simIvfTopkOnVecs(vecs)))
      .unionAll(per("ivfpq", simIvfPqTopkOnVecs(vecs)))
      .orderBy($"method")
      .localCheckpoint(true)
    org.apache.spark.sql.GraftBridge.unpersistLocalCheckpoint(vecs)
    org.apache.spark.sql.GraftBridge.unpersistLocalCheckpoint(brute)
    report
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_recall_report" -> (simRecallReport _),
    "sim_quantized_rerank" -> (simQuantizedRerank _),
    "sim_bruteforce_topk" -> (simBruteforceTopk _),
    "sim_filtered_topk" -> (simFilteredTopk _),
    "sim_quantized_topk" -> (simQuantizedTopk _),
    "sim_lsh_topk" -> (simLshTopk _),
    "sim_ivf_topk" -> (simIvfTopk _),
    "sim_ivfpq_topk" -> (simIvfPqTopk _),
    "sim_label_centroids" -> (simLabelCentroids _))

  /** DuckDB twin of [[simIvfTopk]] — promoted from rows-only in r9: the
    * codebook is DATA-DERIVED (first nCells vectors), so the oracle needs
    * no literals at all; cell assignment re-derives the
    * [[graft.functions.VectorOps.topCells]] kernel's exact arithmetic —
    * `dot / (sqrt(na) · sqrt(nb))` in that operation order via
    * `list_inner_product` (both engines accumulate sequentially, so the
    * doubles agree bitwise) — with the kernel's score-DESC / cell-DESC
    * tie-break in the window. The earlier "argmax isn't ANSI" argument
    * held SQL to re-implementing the kernel; with the arithmetic order
    * matched, the re-implementation pins exactly the claim that matters
    * (same cells → same candidates → same top-k). */
  val simIvfTopkSql: String = {
    val cos =
      """(CASE WHEN sqrt(list_inner_product(v.emb, v.emb)) * sqrt(list_inner_product(cb.cemb, cb.cemb)) = 0
        |       THEN 0.0
        |       ELSE list_inner_product(v.emb, cb.cemb) /
        |            (sqrt(list_inner_product(v.emb, v.emb)) * sqrt(list_inner_product(cb.cemb, cb.cemb))) END)""".stripMargin
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |cb AS (SELECT vec_id AS cell, emb AS cemb FROM v WHERE vec_id < $IvfNCells),
       |scored AS (
       |  SELECT v.vec_id, cb.cell,
       |    row_number() OVER (PARTITION BY v.vec_id ORDER BY $cos DESC, cb.cell DESC) AS rnk
       |  FROM v CROSS JOIN cb
       |),
       |assigned AS (SELECT vec_id, cell FROM scored WHERE rnk = 1),
       |probes AS (SELECT vec_id AS query_id, cell FROM scored
       |           WHERE vec_id < $NQueries AND rnk <= $IvfNProbe),
       |cand AS (
       |  SELECT DISTINCT p.query_id, a.vec_id
       |  FROM assigned a JOIN probes p ON a.cell = p.cell
       |  WHERE a.vec_id <> p.query_id
       |),
       |ranked AS (
       |  SELECT c.query_id, c.vec_id AS neighbor_id,
       |    list_cosine_similarity(q.emb, n.emb) AS cos,
       |    row_number() OVER (PARTITION BY c.query_id
       |      ORDER BY list_cosine_similarity(q.emb, n.emb) DESC, c.vec_id) AS rank
       |  FROM cand c
       |  JOIN v q ON q.vec_id = c.query_id
       |  JOIN v n ON n.vec_id = c.vec_id
       |)
       |SELECT query_id, neighbor_id, rank, round(cos, 4) AS cosine
       |FROM ranked WHERE rank <= $K
       |ORDER BY query_id, rank""".stripMargin
  }

  /** DuckDB twin of [[simLshTopk]] — the last ANN face promotable without
    * re-deriving PQ codes: the index side reuses the deterministic 4×4
    * sign-LSH banding (inlined plane literals, the dedup_embedding_cosine
    * oracle's construction); the QUERY side re-derives multi-probe — per
    * band, the 15 non-empty flip masks scored by summed |normalized
    * margin| of their flipped planes (plane norms computed by the same
    * Scala at SQL-generation time and inlined, additions in ascending
    * plane order for bitwise agreement), sorted (score, mask) ascending
    * by DuckDB's lexicographic struct sort — the engine's array_sort —
    * and the exact key plus the `nProbe` cheapest flips become probe
    * keys. Candidates then flow through the same equi-join + exact-cosine
    * top-k as the other sim_* oracles. */
  val simLshTopkSql: String = {
    val planes = Similarity.signLshPlanes(LshBands * LshPlanesPerBand, dim = 64)
    val norms = planes.map(p => math.sqrt(p.map(x => x * x).sum))
    def dot(p: Seq[Double]): String =
      s"list_inner_product(emb, [${p.mkString(", ")}])"
    // index side: exact keys from dot signs (≡ margin signs; norms > 0)
    val bandSelects = (0 until LshBands).map { b =>
      val key = (0 until LshPlanesPerBand).map { i =>
        s"(CASE WHEN ${dot(planes(b * LshPlanesPerBand + i))} >= 0 THEN ${1L << i} ELSE 0 END)"
      }.mkString(" + ")
      s"  SELECT vec_id, $b AS band, $key AS key FROM v"
    }.mkString("\n  UNION ALL\n")
    // query side: margins as columns, then key + mask ranking per band
    val marginSelects = (0 until LshBands).map { b =>
      val ms = (0 until LshPlanesPerBand).map { i =>
        val p = b * LshPlanesPerBand + i
        s"${dot(planes(p))} / ${norms(p)} AS m$i"
      }.mkString(",\n      ")
      s"  SELECT query_id, $b AS band,\n      $ms FROM q"
    }.mkString("\n  UNION ALL\n")
    val key = (0 until LshPlanesPerBand).map { i =>
      s"(CASE WHEN m$i >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" + ")
    val maskStructs = (1 until (1 << LshPlanesPerBand)).map { mask =>
      val score = (0 until LshPlanesPerBand)
        .filter(i => (mask & (1 << i)) != 0)
        .map(i => s"abs(m$i)").mkString(" + ")
      s"{'score': $score, 'mask': CAST($mask AS BIGINT)}"
    }.mkString("[", ",\n       ", "]")
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |banded AS (
       |$bandSelects
       |),
       |q AS (SELECT vec_id AS query_id, emb FROM v WHERE vec_id < $NQueries),
       |margins AS (
       |$marginSelects
       |),
       |probes AS (
       |  SELECT query_id, band, unnest(list_prepend(key,
       |    list_transform(list_sort($maskStructs)[1:$LshNProbe],
       |      s -> xor(key, s.mask)))) AS key
       |  FROM (SELECT query_id, band, $key AS key,
       |          m0, m1, m2, m3 FROM margins)
       |),
       |cand AS (
       |  SELECT DISTINCT p.query_id, b.vec_id
       |  FROM banded b JOIN probes p ON b.band = p.band AND b.key = p.key
       |  WHERE b.vec_id <> p.query_id
       |),
       |ranked AS (
       |  SELECT c.query_id, c.vec_id AS neighbor_id,
       |    list_cosine_similarity(qq.emb, n.emb) AS cos,
       |    row_number() OVER (PARTITION BY c.query_id
       |      ORDER BY list_cosine_similarity(qq.emb, n.emb) DESC, c.vec_id) AS rank
       |  FROM cand c
       |  JOIN v qq ON qq.vec_id = c.query_id
       |  JOIN v n ON n.vec_id = c.vec_id
       |)
       |SELECT query_id, neighbor_id, rank, round(cos, 4) AS cosine
       |FROM ranked WHERE rank <= $K
       |ORDER BY query_id, rank""".stripMargin
  }

  /** DuckDB twin of [[simIvfPqTopk]] — completes the ANN-face promotions:
    * every codebook is DATA-DERIVED (coarse = first nCells vectors, PQ
    * sub-codebooks = their per-subspace slices), so the oracle re-derives
    * the whole index from the table: coarse assignment and probes with the
    * topCells kernel arithmetic (the [[simIvfTopkSql]] construction), PQ
    * codes as per-(vector, subspace) argmax over centroid-slice cosines
    * (same kernel order on the slices), the query ADC tables as plain
    * sequential dot products, the ADC score as an EXPLICIT ascending-m
    * addition chain (an aggregate SUM would have engine-dependent order —
    * the kernel adds m = 0..M-1), then shortlist-by-ADC and the exact
    * fp32 re-rank. */
  val simIvfPqTopkSql: String = {
    val dsub = 64 / PqM
    def slice(col: String) = s"$col[(sm.m*$dsub+1):(sm.m*$dsub+$dsub)]"
    val subCos = {
      val dot = s"list_inner_product(${slice("v.emb")}, ${slice("cb.cemb")})"
      val na = s"list_inner_product(${slice("v.emb")}, ${slice("v.emb")})"
      val nb = s"list_inner_product(${slice("cb.cemb")}, ${slice("cb.cemb")})"
      s"(CASE WHEN sqrt($na) * sqrt($nb) = 0 THEN 0.0 ELSE $dot / (sqrt($na) * sqrt($nb)) END)"
    }
    val cos = {
      val dot = "list_inner_product(v.emb, cb.cemb)"
      val na = "list_inner_product(v.emb, v.emb)"
      val nb = "list_inner_product(cb.cemb, cb.cemb)"
      s"(CASE WHEN sqrt($na) * sqrt($nb) = 0 THEN 0.0 ELSE $dot / (sqrt($na) * sqrt($nb)) END)"
    }
    val adcChain = (0 until PqM)
      .map(m => s"t.tbl[$m*$PqKs + c.codes[${m + 1}] + 1]")
      .mkString(" + ")
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |cb AS (SELECT vec_id AS cell, emb AS cemb FROM v WHERE vec_id < ${math.max(IvfNCells, PqKs)}),
       |scored AS (
       |  SELECT v.vec_id, cb.cell,
       |    row_number() OVER (PARTITION BY v.vec_id ORDER BY $cos DESC, cb.cell DESC) AS rnk
       |  FROM v CROSS JOIN cb WHERE cb.cell < $IvfNCells
       |),
       |assigned AS (SELECT vec_id, cell FROM scored WHERE rnk = 1),
       |probes AS (SELECT vec_id AS query_id, cell FROM scored
       |           WHERE vec_id < $NQueries AND rnk <= $IvfNProbe),
       |subm AS (SELECT unnest(range(0, $PqM)) AS m),
       |subscored AS (
       |  SELECT v.vec_id, sm.m, cb.cell AS j,
       |    row_number() OVER (PARTITION BY v.vec_id, sm.m
       |      ORDER BY $subCos DESC, cb.cell DESC) AS rnk
       |  FROM v CROSS JOIN subm sm CROSS JOIN cb WHERE cb.cell < $PqKs
       |),
       |codes AS (SELECT vec_id, list(j ORDER BY m) AS codes
       |          FROM subscored WHERE rnk = 1 GROUP BY vec_id),
       |qtbl AS (
       |  SELECT v.vec_id AS query_id,
       |    list(list_inner_product(${slice("v.emb")}, ${slice("cb.cemb")})
       |         ORDER BY sm.m, cb.cell) AS tbl
       |  FROM v CROSS JOIN subm sm CROSS JOIN cb
       |  WHERE v.vec_id < $NQueries AND cb.cell < $PqKs
       |  GROUP BY v.vec_id
       |),
       |adc AS (
       |  SELECT p.query_id, a.vec_id, $adcChain AS adc
       |  FROM assigned a
       |  JOIN probes p ON a.cell = p.cell AND a.vec_id <> p.query_id
       |  JOIN codes c ON c.vec_id = a.vec_id
       |  JOIN qtbl t ON t.query_id = p.query_id
       |),
       |short AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id,
       |      row_number() OVER (PARTITION BY query_id ORDER BY adc DESC, vec_id) AS qrank
       |    FROM adc)
       |  WHERE qrank <= $PqShortlist
       |),
       |ranked AS (
       |  SELECT s.query_id, s.vec_id AS neighbor_id,
       |    list_cosine_similarity(qq.emb, n.emb) AS cos,
       |    row_number() OVER (PARTITION BY s.query_id
       |      ORDER BY list_cosine_similarity(qq.emb, n.emb) DESC, s.vec_id) AS rank
       |  FROM short s
       |  JOIN v qq ON qq.vec_id = s.query_id
       |  JOIN v n ON n.vec_id = s.vec_id
       |)
       |SELECT query_id, neighbor_id, rank, round(cos, 4) AS cosine
       |FROM ranked WHERE rank <= $K
       |ORDER BY query_id, rank""".stripMargin
  }

  /** DuckDB twin of [[simRecallReport]]: each method's oracle SQL embeds
    * as a subquery (nested WITH — the CTE names don't collide across
    * subqueries), and the recall arithmetic re-derives hits/K per query.
    * Promotable exactly because all three ANN faces now have SQL twins —
    * the report carries no timings, only set overlap. */
  val simRecallReportSql: String = {
    def per(method: String, annSql: String): String =
      s"""SELECT '$method' AS method, CAST(count(*) AS BIGINT) AS n_queries,
         |  round(avg(recall), 4) AS mean_recall,
         |  round(min(recall), 4) AS min_recall
         |FROM (
         |  SELECT q.query_id, CAST(coalesce(h.hits, 0) AS DOUBLE) / $K AS recall
         |  FROM (SELECT DISTINCT query_id FROM brute) q
         |  LEFT JOIN (
         |    SELECT a.query_id, count(*) AS hits
         |    FROM ($annSql) a
         |    JOIN brute b ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
         |    GROUP BY a.query_id) h ON q.query_id = h.query_id)""".stripMargin
    s"""WITH brute AS (SELECT query_id, neighbor_id FROM ($simBruteforceTopkSql))
       |${per("lsh", simLshTopkSql)}
       |UNION ALL
       |${per("ivf", simIvfTopkSql)}
       |UNION ALL
       |${per("ivfpq", simIvfPqTopkSql)}
       |ORDER BY method""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "sim_lsh_topk" -> simLshTopkSql,
    "sim_ivfpq_topk" -> simIvfPqTopkSql,
    "sim_recall_report" -> simRecallReportSql,
    "sim_quantized_rerank" -> simQuantizedRerankSql,
    "sim_bruteforce_topk" -> simBruteforceTopkSql,
    "sim_filtered_topk" -> simFilteredTopkSql,
    "sim_quantized_topk" -> simQuantizedTopkSql,
    "sim_ivf_topk" -> simIvfTopkSql,
    "sim_label_centroids" -> simLabelCentroidsSql)
}
