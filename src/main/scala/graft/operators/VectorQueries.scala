package graft.operators

import graft.QueryDef

object VectorQueries {
  def defs: Seq[QueryDef] = Seq()
}
