package graft.ops

/** §2 — Joins (filled incrementally; see SURVEY.md §2). */
object Joins {
  def all: Seq[Q] = Seq()
}
