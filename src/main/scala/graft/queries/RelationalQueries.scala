package graft.queries

/** SURVEY.md §2 rows 1–29 — filled in milestone M2. */
object RelationalQueries {
  def all: Seq[Q] = Seq()
}
