package graft.ops

/** §2 — Generators (filled incrementally; see SURVEY.md §2). */
object Generators {
  def all: Seq[Q] = Seq()
}
