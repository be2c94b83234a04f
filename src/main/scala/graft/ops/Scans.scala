package graft.ops

/** §2 — Scans (filled incrementally; see SURVEY.md §2). */
object Scans {
  def all: Seq[Q] = Seq()
}
