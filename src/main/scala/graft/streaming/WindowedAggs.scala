package graft.streaming

import graft.Q

object WindowedAggs {
  val all: Seq[Q] = Seq()
}
