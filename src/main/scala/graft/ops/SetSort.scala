package graft.ops

/** §2 — SetSort (filled incrementally; see SURVEY.md §2). */
object SetSort {
  def all: Seq[Q] = Seq()
}
