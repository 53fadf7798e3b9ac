package graft.operators

/** SQL identifier quoting shared by the sqlRecipe generators (AsofJoin,
  * RangeJoin, and any future SQL-surface emitter): columns quote as one
  * backticked part; table names may be catalog-qualified (db.table) and
  * quote per dot-separated part, or the emitted FROM clause becomes one
  * dotted identifier. Neutral home so no operator depends on another for
  * generic plumbing.
  *
  * Embedded metacharacters are escaped, not rejected: backticks double
  * inside backtick-quoted identifiers, and [[strLit]] backslash-escapes
  * string literals (Spark's default parser treats `\` as an escape inside
  * `'...'`), so a hostile or merely unlucky column name can never break
  * out of its quoting context in generated SQL. */
private[operators] object SqlIdent {
  def col(c: String): String = s"`${c.replace("`", "``")}`"
  def table(t: String): String =
    t.split('.').map(p => s"`${p.replace("`", "``")}`").mkString(".")
  /** A Spark SQL single-quoted string literal holding exactly `s`. */
  def strLit(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
}
