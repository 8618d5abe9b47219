package graft.sources

import java.nio.file.{Files, Path}

/** The one recursive-delete helper (Catalog table drops, DDL scratch dirs,
  * bench soak data, Verify stale-output cleanup all use it). Always closes
  * the walk stream; `swallowErrors` selects the policy — cleanup paths
  * that must never abort their caller skip undeletable entries, while
  * table mutations propagate the first failure. */
object FsUtil {
  def deleteRecursively(p: Path, swallowErrors: Boolean = false): Unit =
    if (Files.exists(p))
      scala.util.Using.resource(Files.walk(p)) { st =>
        st.sorted(java.util.Comparator.reverseOrder()).forEach { q =>
          try Files.delete(q)
          catch { case e: Exception => if (!swallowErrors) throw e }
        }
      }
}
