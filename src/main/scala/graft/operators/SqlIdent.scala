package graft.operators

/** SQL identifier quoting shared by the sqlRecipe generators (AsofJoin,
  * RangeJoin, and any future SQL-surface emitter): columns quote as one
  * backticked part; table names may be catalog-qualified (db.table) and
  * quote per dot-separated part, or the emitted FROM clause becomes one
  * dotted identifier. Neutral home so no operator depends on another for
  * generic plumbing. */
private[operators] object SqlIdent {
  def col(c: String): String = s"`$c`"
  def table(t: String): String = t.split('.').map(p => s"`$p`").mkString(".")
}
