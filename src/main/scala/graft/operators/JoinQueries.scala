package graft.operators

import graft.QueryDef

object JoinQueries {
  def defs: Seq[QueryDef] = Seq()
}
