package graft.ops

/** §2 — StreamTwins (filled incrementally; see SURVEY.md §2). */
object StreamTwins {
  def all: Seq[Q] = Seq()
}
