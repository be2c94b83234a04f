package graft.ops

/** §2 — Windows (filled incrementally; see SURVEY.md §2). */
object Windows {
  def all: Seq[Q] = Seq()
}
