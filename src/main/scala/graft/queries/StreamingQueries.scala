package graft.queries

/** SURVEY.md §2 rows 44–46 (batch-oracled window forms) — milestone M5. */
object StreamingQueries {
  def all: Seq[Q] = Seq()
}
