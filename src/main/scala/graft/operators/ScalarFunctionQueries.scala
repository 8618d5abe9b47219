package graft.operators

import graft.QueryDef

object ScalarFunctionQueries {
  def defs: Seq[QueryDef] = Seq()
}
