package graft.operators

import graft.Q

object TextAnalysis {
  val all: Seq[Q] = Seq()
}
