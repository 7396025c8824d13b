package graft.queries

/** DuckDB SQL mirrors of the engine's text primitives
  * (graft.functions.TextFunctions.normalizeText / wordTokens / tokenCount).
  *
  * These fragments are THE single source of the oracle-side tokenizer: every
  * oracle query that tokenizes text interpolates them, so an engine-side
  * tokenizer change has exactly one SQL counterpart to update (the same
  * no-drift rule as the generated stopword/rate-map SQL). The character class
  * spells out Java's ASCII \s as [ \t\n\x0B\f\r] because RE2's \s lacks \x0B.
  */
object OracleFragments {

  /** normalizeText(c): lower, collapse whitespace runs, trim. */
  def norm(c: String): String =
    raw"trim(regexp_replace(lower($c), '[ \t\n\x0B\f\r]+', ' ', 'g'))"

  /** wordTokens(c) for non-empty normalized text. */
  def tokens(c: String): String =
    s"string_split(${norm(c)}, ' ')"

  /** tokenCount(c) including the empty-text → 0 guard (string_split of ''
    * yields [''], not []). */
  def tokenCount(c: String): String =
    s"CASE WHEN length(${norm(c)}) = 0 THEN 0 ELSE len(${tokens(c)}) END"

  /** DataPipeline.splitCol(id): the 80/10/10 md5-hex-bucket train/val/test
    * assignment. One definition on each side — every oracle needing the
    * split interpolates this, so a boundary change cannot drift between
    * prep_split and its consumers (contamination). */
  def splitCase(idCol: String): String =
    s"""CASE WHEN substring(md5(CAST($idCol AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
       |         WHEN substring(md5(CAST($idCol AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
       |         ELSE 'test' END""".stripMargin

  /** TextFunctions.qualityScore(c): the full heuristic-quality formula.
    * Every term is a ratio of integer counts and the additions happen in the
    * same left-to-right order as the engine's expression tree, so the double
    * is bitwise reproducible (validated at the bucket boundaries by
    * text_quality and emitted raw by prep_screen / dedup_canonical). */
  /** The 'en' stopword profile, generated from the same
    * TextFunctions.stopwords map the engine's quality kernel uses — an edit
    * to the profile cannot drift the oracle (same rule as [[langidBest]]). */
  private val enStopwordsSql: String =
    graft.functions.TextFunctions.stopwords("en").map(w => s"'$w'")
      .mkString("[", ",", "]")

  def quality(c: String): String =
    raw"""greatest(least(
      |      0.25 * (CASE WHEN length($c) BETWEEN 100 AND 10000 THEN 1.0
      |                   WHEN length($c) >= 20 THEN 0.5 ELSE 0.0 END)
      |      + 0.25 * (CAST(length($c) - length(regexp_replace($c, '[A-Za-z]', '', 'g')) AS DOUBLE)
      |                / greatest(length($c), 1))
      |      + 0.2 * least(4 * (CAST(len(list_filter(${tokens(c)},
      |                    t -> list_contains($enStopwordsSql, t))) AS DOUBLE)
      |               / greatest(${tokenCount(c)}, 1)), 1.0)
      |      + 0.3 * (CASE WHEN (CAST(length(${norm(c)}) AS DOUBLE) + 1)
      |                         / greatest(${tokenCount(c)}, 1)
      |                         BETWEEN 3 AND 12 THEN 1.0 ELSE 0.0 END)
      |      - 2 * (CAST(length($c) - length(regexp_replace($c, '[0-9]', '', 'g')) AS DOUBLE)
      |             / greatest(length($c), 1))
      |      - 2 * (CAST(length($c) - length(regexp_replace($c, '[^A-Za-z0-9 \t\n\x0B\f\r]', '', 'g')) AS DOUBLE)
      |             / greatest(length($c), 1)),
      |    1.0), 0.0)""".stripMargin

  /** LangIdUtil.predict over a tokens-list expression: the list_max argmax
    * over `{hits, code}` profile structs (struct comparison is field-order
    * lexicographic — hits first, then code, exactly the engine's
    * strictly-greater-or-equal-and-later-code rule). GENERATED from the same
    * TextFunctions.stopwords map the engine evaluates, so the profiles can
    * never drift between Spark and the oracle. Wrap with [[langidPredicted]]
    * to get the final code. */
  def langidBest(toksExpr: String): String = {
    val profileStructs = graft.functions.TextFunctions.stopwords.toSeq.sortBy(_._1)
      .map { case (code, words) =>
        val arr = words.map(w => s"'$w'").mkString("[", ", ", "]")
        s"{'hits': len(list_filter($toksExpr, x -> list_contains($arr, x))), 'code': '$code'}"
      }.mkString(",\n      ")
    s"""list_max([
       |      $profileStructs
       |    ])""".stripMargin
  }

  /** The predicted language code from a [[langidBest]] struct column. */
  def langidPredicted(bestCol: String): String =
    s"CASE WHEN $bestCol['hits'] > 0 THEN $bestCol['code'] ELSE 'und' END"
}
