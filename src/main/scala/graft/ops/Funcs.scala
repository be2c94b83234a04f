package graft.ops

/** §2 — Funcs (filled incrementally; see SURVEY.md §2). */
object Funcs {
  def all: Seq[Q] = Seq()
}
