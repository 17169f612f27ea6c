package graft.queries

/** SURVEY.md §2 rows 30–35, 38, 42 — filled in milestone M3. */
object TextQueries {
  def all: Seq[Q] = Seq()
}
