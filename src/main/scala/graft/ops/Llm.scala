package graft.ops

/** §2 — Llm (filled incrementally; see SURVEY.md §2). */
object Llm {
  def all: Seq[Q] = Seq()
}
