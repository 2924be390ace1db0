package graft.pipeline

import graft.Q

object PipelineQueries {
  val all: Seq[Q] = Seq()
}
