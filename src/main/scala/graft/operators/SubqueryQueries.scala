package graft.operators

import graft.QueryDef

object SubqueryQueries {
  def defs: Seq[QueryDef] = Seq()
}
