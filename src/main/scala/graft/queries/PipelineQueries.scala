package graft.queries

/** Training-data-pipeline operators beyond the reconstructed reference
  * surface: dedup variants, ANN search, text analysis, fingerprinting.
  */
object PipelineQueries {
  def all: Seq[Q] = Seq()
}
