package graft.operators

import graft.QueryDef

object AggregateQueries {
  def defs: Seq[QueryDef] = Seq()
}
