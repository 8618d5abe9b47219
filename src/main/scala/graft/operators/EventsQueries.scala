package graft.operators

import graft.QueryDef

object EventsQueries {
  def defs: Seq[QueryDef] = Seq()
}
