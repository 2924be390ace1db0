package graft.operators

import graft.Q

object Dedup {
  val all: Seq[Q] = Seq()
}
