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
}
