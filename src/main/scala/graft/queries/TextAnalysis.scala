package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}
import graft.sources.Tables

/** Text-analysis operators over `documents`: token statistics, quality
  * scoring, language ID, fingerprinting. All pure Catalyst projections
  * (TextFunctions) — at 100 TB these are embarrassingly parallel scans with
  * no shuffle except the final small aggregations. */
object TextAnalysis {

  /** Per-document token/char statistics. All counts are integers; ratios are
    * int/int doubles → bitwise reproducible in the oracle. All five counters
    * come from ONE codegen'd code-point walk ([[TF.textScanStats]] —
    * bitwise-pinned to the Column-tree formulas by FunctionsSpec); the
    * composed form cost ~8 interpreted regex passes per document. */
  def textStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val st = TF.textScanStats($"text")
    val len = greatest(length($"text"), lit(1)).cast("double")
    Tables.documents(spark, dir)
      .select(
        $"doc_id",
        length($"text").cast("long").as("n_chars"),
        st.getItem(0).cast("long").as("n_tokens"),
        st.getItem(1).cast("long").as("n_bpe_tokens"),
        round(st.getItem(2).cast("double") / len, 6).as("alpha_ratio"),
        round(st.getItem(3).cast("double") / len, 6).as("digit_ratio"),
        round(st.getItem(4).cast("double") / len, 6).as("ws_ratio"))
      .orderBy($"doc_id")
  }

  val textStatsSql: String =
    raw"""SELECT doc_id,
      |  length(text) AS n_chars,
      |  ${OracleFragments.tokenCount("text")} AS n_tokens,
      |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0B\f\r]')) AS n_bpe_tokens,
      |  round(CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS DOUBLE)
      |        / greatest(length(text), 1), 6) AS alpha_ratio,
      |  round(CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
      |        / greatest(length(text), 1), 6) AS digit_ratio,
      |  round(CAST(length(text) - length(regexp_replace(text, '[ \t\n\x0B\f\r]', '', 'g')) AS DOUBLE)
      |        / greatest(length(text), 1), 6) AS ws_ratio
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Quality-score buckets: integer-ratio arithmetic → deterministic bucket
    * edges; aggregated per source. The score itself is engine policy, so the
    * oracle reproduces the full formula. */
  def textQuality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .withColumn("q", TF.qualityScore($"text"))
      .withColumn("bucket",
        when($"q" >= 0.7, "high").when($"q" >= 0.4, "mid").otherwise("low"))
      .groupBy($"source", $"bucket")
      .agg(count(lit(1)).as("n_docs"), round(avg(length($"text")), 4).as("avg_chars"))
      .orderBy($"source", $"bucket")
  }

  // The full quality formula transliterated (shared fragment — see
  // OracleFragments.quality for the bitwise-reproducibility argument).
  val textQualitySql: String =
    s"""WITH scored AS (
      |  SELECT source, text,
      |    ${OracleFragments.quality("text")} AS q
      |  FROM documents)
      |SELECT source,
      |  CASE WHEN q >= 0.7 THEN 'high' WHEN q >= 0.4 THEN 'mid' ELSE 'low' END AS bucket,
      |  count(*) AS n_docs, round(avg(length(text)), 4) AS avg_chars
      |FROM scored
      |GROUP BY 1, 2
      |ORDER BY source, bucket""".stripMargin

  /** Language-ID heuristic vs the labeled `lang` column: distribution of
    * (actual, predicted) pairs. Oracle-checked: the stopword-hit argmax
    * transliterates to DuckDB as `list_max` over `{hits, code}` structs
    * (struct comparison is field-order lexicographic — hits first, then code,
    * exactly the engine's strictly-greater-or-equal-and-later-code rule). */
  def textLangid(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"lang", TF.languageId($"text").as("predicted"))
      .groupBy($"lang", $"predicted")
      .agg(count(lit(1)).as("n"))
      .orderBy($"lang", $"predicted")
  }

  // Generated from the SAME TextFunctions.stopwords map the engine uses, so
  // the profiles can never drift between Spark and the oracle. Tokenization
  // matches LangIdUtil.predict: lower → split on runs of [ \t\n\x0B\f\r]
  // (Java's ASCII \s, spelled out because RE2's \s lacks \x0B). Degenerate
  // docs yield only empty/whitespace tokens, which hit no profile → 'und'.
  val textLangidSql: String =
    s"""WITH toks AS (
       |  SELECT lang,
       |    ${OracleFragments.tokens("text")} AS t
       |  FROM documents),
       |best AS (
       |  SELECT lang,
       |    ${OracleFragments.langidBest("t")} AS b
       |  FROM toks)
       |SELECT lang,
       |  ${OracleFragments.langidPredicted("b")} AS predicted,
       |  count(*) AS n
       |FROM best
       |GROUP BY 1, 2
       |ORDER BY lang, predicted""".stripMargin

  /** Exact per-source heavy hitters: top-5 tokens by frequency, ties broken
    * to the lexicographically smaller token. The highest-cardinality shuffle
    * in the text family — explode to one row per token, partial-agg before
    * the (source, token) shuffle, then a WindowGroupLimit top-k per source
    * (rank filter pushed into the sort, no full per-source sort). */
  def textTopTokens(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val counts = Tables.documents(spark, dir)
      .select($"source", explode(TF.wordTokens($"text")).as("token"))
      .groupBy($"source", $"token")
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"n".desc, $"token")
    counts.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5)
      .select($"source", $"rank".cast("long").as("rank"), $"token", $"n")
      .orderBy($"source", $"rank")
  }

  val textTopTokensSql: String =
    s"""WITH toks AS (
      |  SELECT source,
      |    unnest(${OracleFragments.tokens("text")}) AS token
      |  FROM documents
      |  WHERE length(${OracleFragments.norm("text")}) > 0),
      |counts AS (
      |  SELECT source, token, count(*) AS n FROM toks GROUP BY 1, 2),
      |ranked AS (
      |  SELECT source, token, n,
      |    row_number() OVER (PARTITION BY source ORDER BY n DESC, token) AS rank
      |  FROM counts)
      |SELECT source, rank, token, n FROM ranked
      |WHERE rank <= 5
      |ORDER BY source, rank""".stripMargin

  /** Per-document md5 fingerprint of normalized text (the exact-dedup key,
    * exposed as its own operator). */
  def textFingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", TF.fingerprintMd5($"text").as("fp"),
        // kernel token count ≡ tokenCount (FunctionsSpec differential)
        TF.textScanStats($"text").getItem(0).cast("long").as("n_tokens"))
      .orderBy($"doc_id")
  }

  val textFingerprintSql: String =
    s"""SELECT doc_id,
      |  md5(${OracleFragments.norm("text")}) AS fp,
      |  ${OracleFragments.tokenCount("text")} AS n_tokens
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Per-source keyword extraction by TF-IDF, rational variant: score =
    * tf · N / df where tf = term count within the source, df = number of
    * sources containing the term, N = number of sources. The classic
    * formulation takes log(N/df); ranking by the rational form keeps every
    * intermediate an exact integer (the only float is one division of
    * identical integers), so the oracle check is hash-exact — no
    * transcendental whose last ulp could differ between libm builds.
    *
    * Scale shape: explode → partial-agg → one (source, token) shuffle (same
    * as [[textTopTokens]]); df is a second agg over the already-collapsed
    * (source, token) pairs — cardinality ≤ vocab × sources, orders of
    * magnitude below the corpus; N joins in as a broadcast 1-row cross. */
  def textTfidf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val counts = Tables.documents(spark, dir)
      .select($"source", explode(TF.wordTokens($"text")).as("token"))
      .groupBy($"source", $"token")
      .agg(count(lit(1)).as("tf"))
    val dfreq = counts.groupBy($"token").agg(count(lit(1)).as("df"))
    val nSources = Tables.documents(spark, dir)
      .agg(countDistinct($"source").as("n_sources"))
    val scored = counts.join(dfreq, "token")
      .crossJoin(broadcast(nSources))
      .withColumn("score", ($"tf" * $"n_sources").cast("double") / $"df")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"score".desc, $"token")
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 3)
      .select($"source", $"rank".cast("long").as("rank"), $"token",
        $"tf", $"df", $"score")
      .orderBy($"source", $"rank")
  }

  val textTfidfSql: String =
    s"""WITH toks AS (
       |  SELECT source, unnest(${OracleFragments.tokens("text")}) AS token
       |  FROM documents
       |  WHERE length(${OracleFragments.norm("text")}) > 0),
       |counts AS (
       |  SELECT source, token, count(*) AS tf FROM toks GROUP BY 1, 2),
       |dfreq AS (
       |  SELECT token, count(*) AS df FROM counts GROUP BY 1),
       |n AS (SELECT count(DISTINCT source) AS n_sources FROM documents),
       |scored AS (
       |  SELECT c.source, c.token, c.tf, d.df,
       |    CAST(c.tf * n.n_sources AS DOUBLE) / d.df AS score
       |  FROM counts c JOIN dfreq d USING (token) CROSS JOIN n),
       |ranked AS (
       |  SELECT source, token, tf, df, score,
       |    row_number() OVER (PARTITION BY source ORDER BY score DESC, token) AS rank
       |  FROM scored)
       |SELECT source, rank, token, tf, df, score
       |FROM ranked WHERE rank <= 3
       |ORDER BY source, rank""".stripMargin

  /** Gopher-style repetition metrics per document (Rae et al. 2021 §A1.1
    * use line/paragraph/n-gram repetition fractions as quality filters; this
    * corpus is single-line, so the word-level pair applies):
    *   - top_token_frac: occurrences of the most frequent token / all tokens
    *     ("most common word" filter);
    *   - dup_trigram_frac: 1 − distinct 3-grams / total 3-grams (duplicated
    *     n-gram mass).
    * A doc is flagged `repetitive` past either threshold (0.2 / 0.05 —
    * engine policy, chosen to split this corpus' observed range).
    *
    * Scale shape: every metric here is a PER-DOCUMENT statistic, so the
    * whole operator is one map-only projection of codegen'd kernels — no
    * explode, no shuffle, no join (the first formulation paid two
    * corpus-wide shuffles to compute a per-row reduction; 13 s → sub-second
    * at sf0.1). Total trigrams is arithmetic on the token count; DISTINCT
    * trigrams is `size(shingleHashSet(text, 3))`; the top-token count is the
    * [[graft.functions.TopTokenCount]] kernel (per-row hashmap bounded by
    * the doc's own vocabulary). Hash-distinct equals string-distinct
    * w.h.p. — the dedup_minhash_pairs 64-bit-collision argument
    * (P ≈ 1e-15 at these set sizes). The fractions are int/int doubles
    * emitted RAW (the repo's rounding rule: Spark and DuckDB round doubles
    * differently at the last ulp). */
  def textRepetition(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nt = TF.textScanStats($"text").getItem(0)
    Tables.documents(spark, dir)
      .select($"doc_id",
        nt.cast("long").as("n_toks"),
        TF.topTokenCount($"text").as("top_cnt"),
        greatest(nt - 2, lit(0)).as("n_tri"),
        size(graft.functions.VectorFunctions.shingleHashSet($"text", 3))
          .as("n_tri_distinct"))
      .select($"doc_id",
        $"n_toks".as("n_tokens"),
        when($"n_toks" > 0, $"top_cnt".cast("double") / $"n_toks")
          .otherwise(0.0).as("top_token_frac"),
        when($"n_tri" > 0,
            lit(1.0) - $"n_tri_distinct".cast("double") / $"n_tri")
          .otherwise(0.0).as("dup_trigram_frac"))
      .withColumn("repetitive",
        $"top_token_frac" > 0.2 || $"dup_trigram_frac" > 0.05)
      .orderBy($"doc_id")
  }

  val textRepetitionSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, ${OracleFragments.tokens("text")} AS t,
       |    length(${OracleFragments.norm("text")}) AS n_norm
       |  FROM documents),
       |cnt AS (
       |  SELECT doc_id, tok, count(*) AS c
       |  FROM (SELECT doc_id, unnest(t) AS tok FROM toks WHERE n_norm > 0)
       |  GROUP BY 1, 2),
       |top AS (
       |  SELECT doc_id, max(c) AS top_cnt, sum(c) AS n_toks FROM cnt GROUP BY 1),
       |tri AS (
       |  SELECT doc_id,
       |    len([array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t) - 1)]) AS n_tri,
       |    len(list_distinct([array_to_string(t[i:i+2], ' ')
       |                       FOR i IN range(1, len(t) - 1)])) AS n_tri_distinct
       |  FROM toks WHERE n_norm > 0
       |  UNION ALL
       |  SELECT doc_id, 0, 0 FROM toks WHERE n_norm = 0),
       |joined AS (
       |  SELECT tri.doc_id,
       |    coalesce(CAST(top.n_toks AS BIGINT), 0) AS n_tokens,
       |    coalesce(CAST(top.top_cnt AS DOUBLE) / top.n_toks, 0.0) AS top_token_frac,
       |    CASE WHEN tri.n_tri > 0
       |         THEN 1.0 - CAST(tri.n_tri_distinct AS DOUBLE) / tri.n_tri
       |         ELSE 0.0 END AS dup_trigram_frac
       |  FROM tri LEFT JOIN top ON tri.doc_id = top.doc_id)
       |SELECT doc_id, n_tokens, top_token_frac, dup_trigram_frac,
       |  (top_token_frac > 0.2 OR dup_trigram_frac > 0.05) AS repetitive
       |FROM joined
       |ORDER BY doc_id""".stripMargin

  /** Per-document character-entropy quality signal (bits/char): low entropy
    * flags repetitive boilerplate and padding, high entropy flags
    * base64/binary splices — the CCNet/Gopher-style gibberish screens.
    *
    * Scale shape: ONE codegen'd per-row kernel ([[TF.charEntropy]] — count
    * table bounded by the doc's own alphabet), so the query is a map-only
    * projection with no shuffle; the relational form (explode chars → count →
    * re-agg) would shuffle every character in the corpus. The `flag` edges
    * compare the UNROUNDED entropy (both engines agree to ~ulp, far from the
    * 2.0/5.2 thresholds on this grid — same argument as textQuality's
    * buckets). */
  def textEntropy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val h = TF.charEntropy($"text")
    Tables.documents(spark, dir)
      .select(
        $"doc_id",
        length($"text").cast("long").as("n_chars"),
        round(h, 6).as("char_entropy"),
        when(h < 2.0, "low_entropy").when(h > 5.2, "high_entropy")
          .otherwise("ok").as("flag"))
      .orderBy($"doc_id")
  }

  // DuckDB's entropy() over the char multiset is the same -Σ p·log₂p (its
  // accumulation order differs by hash layout — ulp-level, see the kernel's
  // determinism note).
  val textEntropySql: String =
    """WITH chars AS (
      |  SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents),
      |h AS (SELECT doc_id, entropy(c) AS ent, count(*) AS n_chars
      |      FROM chars GROUP BY doc_id)
      |SELECT doc_id, n_chars, round(ent, 6) AS char_entropy,
      |  CASE WHEN ent < 2.0 THEN 'low_entropy'
      |       WHEN ent > 5.2 THEN 'high_entropy'
      |       ELSE 'ok' END AS flag
      |FROM h
      |ORDER BY doc_id""".stripMargin

  /** Bigram language-model score — the CCNet perplexity-filter shape: an LM
    * is trained on REFERENCE text (here the deterministic train split, the
    * same [[DataPipeline.splitCol]] every other operator uses) and every
    * document is scored by the mean log₂ P(w₂|w₁) of its bigram instances
    * under Laplace-smoothed train-split counts, P = (c(w₁w₂)+1)/(c(w₁)+V).
    * Fluent in-distribution text scores high; word salad and novel-token
    * gibberish score low (an unseen bigram costs ~−log₂ V). The reference
    * corpus must NOT be the scored doc itself — self-trained MLE grades a
    * doc of never-seen tokens "perfectly predictable" (every ratio 1); the
    * smoothed held-out form is what actually discriminates (fixture-pinned).
    *
    * Scale shape: this one is INHERENTLY relational — the LM "model" is a
    * corpus-wide count table no per-row kernel can hold — so the honest plan
    * is: bigram/unigram counts via map-side-combinable hash aggs over the
    * exploded token stream, two LEFT equi-joins keyed on the (uniform) gram
    * strings to re-attach counts to each doc's bigram instances, one
    * broadcast scalar (V), then one doc-keyed mean. Shuffle volume ≈ token
    * volume; the count tables are never assumed broadcastable (a real
    * vocabulary outgrows one executor).
    *
    * Determinism: each term is log₂ of an exact int/int ratio;
    * accumulation-order drift is ≤ a few ulp on ~doc-length sums, far inside
    * the 1e-6 grid (the charEntropy argument). */
  def textLmScore(spark: SparkSession, dir: String): DataFrame =
    textLmScoreOn(Tables.documents(spark, dir))

  /** [[textLmScore]] over any (doc_id, text) frame — split out for the
    * gibberish-discrimination fixture spec. */
  def textLmScoreOn(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    val toks = documents
      .select($"doc_id", TF.wordTokens($"text").as("toks"))
      .filter(size($"toks") >= 2)
    val isTrain = DataPipeline.splitCol($"doc_id") === "train"
    // ONE bigram derivation serves both the train-side counts (filter) and
    // the scoring side; join keys are 64-bit hashes of the gram strings —
    // 8-byte shuffle keys, exact w.h.p. (the dedup_minhash_pairs collision
    // argument: a collision would merge two counts, P ≈ grams²/2⁶⁴)
    val docBigrams = toks.select($"doc_id", isTrain.as("train"),
      explode(transform(slice($"toks", lit(1), size($"toks") - 1),
        (x, i) => struct(x.as("w1"), element_at($"toks", i + 2).as("w2")))).as("bg"))
      .select($"doc_id", $"train",
        xxhash64($"bg.w1").as("w1h"),
        xxhash64($"bg.w1", $"bg.w2").as("bh"))
    val uni = toks.filter(isTrain)
      .select(explode($"toks").as("w"))
      .select(xxhash64($"w").as("w1h"))
      .groupBy($"w1h").agg(count(lit(1)).as("cu"))
    val big = docBigrams.filter($"train")
      .groupBy($"bh").agg(count(lit(1)).as("cb"))
    val vocab = uni.agg(count(lit(1)).as("v"))
    docBigrams
      .join(big, Seq("bh"), "left")
      .join(uni, Seq("w1h"), "left")
      .crossJoin(broadcast(vocab))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(log2(
          (coalesce($"cb", lit(0L)) + 1).cast("double") /
            (coalesce($"cu", lit(0L)) + $"v").cast("double"))), 6).as("lm_score"))
      .orderBy($"doc_id")
  }

  val textLmScoreSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, ${OracleFragments.tokens("text")} AS toks
       |  FROM documents
       |  WHERE length(${OracleFragments.norm("text")}) > 0
       |    AND len(${OracleFragments.tokens("text")}) >= 2),
       |bl AS (
       |  SELECT doc_id, toks[i] AS w1, toks[i] || ' ' || toks[i + 1] AS b
       |  FROM tok, LATERAL (SELECT unnest(range(1, len(toks))) AS i) r),
       |train AS (SELECT * FROM bl
       |          WHERE ${OracleFragments.splitCase("doc_id")} = 'train'),
       |u AS (SELECT w1, count(*) AS cu
       |      FROM (SELECT unnest(toks) AS w1 FROM tok
       |            WHERE ${OracleFragments.splitCase("doc_id")} = 'train')
       |      GROUP BY 1),
       |bc AS (SELECT b, count(*) AS cb FROM train GROUP BY 1),
       |v AS (SELECT count(*) AS v FROM u)
       |SELECT bl.doc_id, count(*) AS n_bigrams,
       |  round(avg(log2(CAST(coalesce(bc.cb, 0) + 1 AS DOUBLE) /
       |                 CAST(coalesce(u.cu, 0) + v.v AS DOUBLE))), 6) AS lm_score
       |FROM bl LEFT JOIN bc USING (b) LEFT JOIN u USING (w1) CROSS JOIN v
       |GROUP BY bl.doc_id
       |ORDER BY doc_id""".stripMargin

  /** Per-document novelty profile: the fraction of a document's DISTINCT
    * 8-grams whose FIRST corpus occurrence (minimum doc_id over every
    * document containing the gram) is this document — "how much new text
    * does each document add when the corpus is scanned in id order". The
    * streaming-curation counterpart of [[graft.queries.Dedup]]'s pairwise
    * operators: a crawl snapshot's marginal value is the novel-gram mass it
    * contributes, and re-crawls / boilerplate-heavy sources show up as
    * near-zero novelty long before any pairwise threshold trips.
    *
    * Scale shape: per-doc distinct hashed grams (pure projection — the
    * codegen'd `shingleHashSet` used by prep_decontaminate), ONE gram-keyed
    * min aggregate (partial aggregation collapses executor-local duplicates;
    * gram keys are near-unique so the shuffle is ~token volume with no hot
    * keys), rejoin on the 8-byte gram key, one doc-keyed count aggregate.
    * Two shuffles total, both on hashed keys — the same bounded shape at
    * 100 TB. Grams travel as 64-bit hashes, not ~50-char strings; a
    * cross-gram hash collision merges two posting lists and could only
    * shift first-occurrence attribution (P ≈ 1e-15 at these set sizes —
    * the prep_decontaminate argument), so the string-gram oracle matches
    * exactly w.h.p. Documents with fewer than 8 tokens have no grams and
    * are absent from the profile on both sides. */
  def textNovelty(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val grams = Tables.documents(spark, dir)
      .select($"doc_id",
        explode(graft.functions.VectorFunctions.shingleHashSet($"text", 8)).as("g"))
    val first = grams.groupBy($"g").agg(min($"doc_id").as("first_doc"))
    grams.join(first, "g")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when($"first_doc" === $"doc_id", 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty", round($"n_novel".cast("double") / $"n_grams", 6))
      .orderBy($"doc_id")
  }

  val textNoveltySql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, ${OracleFragments.tokens("text")} AS t
       |  FROM documents
       |  WHERE length(${OracleFragments.norm("text")}) > 0),
       |g AS (
       |  SELECT doc_id,
       |    unnest(list_distinct([array_to_string(t[i:i+7], ' ')
       |                          FOR i IN range(1, len(t) - 6)])) AS g
       |  FROM toks),
       |f AS (SELECT g, min(doc_id) AS first_doc FROM g GROUP BY g)
       |SELECT g.doc_id, count(*) AS n_grams,
       |  CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       |  round(CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
       |        / count(*), 6) AS novelty
       |FROM g JOIN f USING (g)
       |GROUP BY g.doc_id
       |ORDER BY doc_id""".stripMargin

  /** Compression-ratio quality signal (Gopher / Dolma family): DEFLATE
    * size over raw UTF-8 size per document. Prose sits mid-range;
    * template/boilerplate spam compresses far below it (repetition is
    * literally what DEFLATE removes); random or encrypted junk refuses to
    * compress. The flags bucket the corpus the way a real pipeline gates:
    * `too_compressible` (ratio < 0.35 — repetitive spam) and
    * `incompressible` (ratio > 0.85 — junk; printable-ASCII junk like
    * base64 tops out near log2(94)/8 ≈ 0.87 under DEFLATE, so the text
    * threshold sits below the binary-random 1.0, not at it).
    *
    * No oracle: DuckDB has no DEFLATE; the byte size is a property of the
    * JVM's zlib, not ANSI-expressible. The spec pins what matters instead —
    * bitwise determinism across runs, exact agreement with a driver-side
    * recompute through the same kernel, and the discrimination property
    * (repetitive ≪ prose < random) on constructed fixtures.
    *
    * Scale shape: ONE codegen'd per-row kernel ([[graft.functions
    * .DeflatedSize]], whole-stage-codegen'd static call, reused
    * thread-local Deflater, reset between rows) — map-only projection, no shuffle but the display
    * sort; the ratio divides two longs derived from the same row. */
  def textCompressRatio(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val raw = octet_length($"text").cast("long")
    val defl = org.apache.spark.sql.GraftBridge.column(
      graft.functions.DeflatedSize(
        org.apache.spark.sql.GraftBridge.expression($"text")))
    Tables.documents(spark, dir)
      .select($"doc_id", raw.as("raw_bytes"), defl.as("deflated_bytes"))
      .withColumn("ratio",
        when($"raw_bytes" === 0, lit(1.0))
          .otherwise($"deflated_bytes".cast("double") / $"raw_bytes"))
      .withColumn("flag",
        when($"ratio" < 0.35, "too_compressible")
          .when($"ratio" > 0.85, "incompressible")
          .otherwise("ok"))
      .orderBy($"doc_id")
  }

  /** Oracle-checkable sibling of [[textCompressRatio]] (round-12 verdict
    * #8): the DEFLATE-based ratio has no DuckDB twin — that query stays
    * rows-only, pinned by its deviation spec — so the GATE-FLAG formula
    * (thresholds, branch order, edge handling) is cross-checked here on a
    * proxy both engines compute exactly: the distinct-token ratio. A
    * drift in the gate logic (threshold typo, inverted branch) now fails
    * a hash oracle instead of hiding behind the uncheckable deflate
    * size. Single-space tokenization matches the corpus generator. */
  def textCompressGate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val words = split($"text", " ")
    Tables.documents(spark, dir)
      .select($"doc_id",
        (size(array_distinct(words)).cast("double") /
          greatest(size(words), lit(1)).cast("double")).as("uniq_ratio"))
      .withColumn("flag",
        when($"uniq_ratio" < 0.35, "too_compressible")
          .when($"uniq_ratio" > 0.85, "incompressible")
          .otherwise("ok"))
      .orderBy($"doc_id")
  }

  val textCompressGateSql: String =
    """SELECT doc_id,
      |  CAST(list_unique(string_split(text, ' ')) AS DOUBLE) /
      |    CAST(greatest(len(string_split(text, ' ')), 1) AS DOUBLE)
      |    AS uniq_ratio,
      |  CASE
      |    WHEN CAST(list_unique(string_split(text, ' ')) AS DOUBLE) /
      |      CAST(greatest(len(string_split(text, ' ')), 1) AS DOUBLE) < 0.35
      |      THEN 'too_compressible'
      |    WHEN CAST(list_unique(string_split(text, ' ')) AS DOUBLE) /
      |      CAST(greatest(len(string_split(text, ' ')), 1) AS DOUBLE) > 0.85
      |      THEN 'incompressible'
      |    ELSE 'ok'
      |  END AS flag
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_compress_gate" -> (textCompressGate _),
    "text_compress_ratio" -> (textCompressRatio _),
    "text_novelty" -> (textNovelty _),
    "text_lm_score" -> (textLmScore _),
    "text_entropy" -> (textEntropy _),
    "text_stats" -> (textStats _),
    "text_quality" -> (textQuality _),
    "text_langid" -> (textLangid _),
    "text_top_tokens" -> (textTopTokens _),
    "text_tfidf" -> (textTfidf _),
    "text_repetition" -> (textRepetition _),
    "text_fingerprint" -> (textFingerprint _))

  val oracles: Map[String, String] = Map(
    "text_compress_gate" -> textCompressGateSql,
    "text_novelty" -> textNoveltySql,
    "text_lm_score" -> textLmScoreSql,
    "text_entropy" -> textEntropySql,
    "text_stats" -> textStatsSql,
    "text_quality" -> textQualitySql,
    "text_langid" -> textLangidSql,
    "text_top_tokens" -> textTopTokensSql,
    "text_tfidf" -> textTfidfSql,
    "text_repetition" -> textRepetitionSql,
    "text_fingerprint" -> textFingerprintSql)
}
