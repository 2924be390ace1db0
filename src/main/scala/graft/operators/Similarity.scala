package graft.operators

import graft.Q

object Similarity {
  val all: Seq[Q] = Seq()
}
