package graft.operators

import graft.Q

object Multimodal {
  val all: Seq[Q] = Seq()
}
