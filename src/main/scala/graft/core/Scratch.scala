package graft.core

/** Deterministic scratch directories for gate builders: one fixed path
  * per (prefix, seed) under java.io.tmpdir, wiped before reuse so a
  * re-run starts clean. Extracted from five per-gate copies of the same
  * rmrf + hashCode idiom. */
object Scratch {

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmrf))
    f.delete(): Unit
  }

  /** Absolute path of a freshly-wiped scratch dir named
    * `<prefix><hex(seed.hashCode)>`. */
  def dir(prefix: String, seed: String): String = {
    val root = new java.io.File(sys.props("java.io.tmpdir"),
      prefix + java.lang.Integer.toHexString(seed.hashCode))
    rmrf(root)
    root.getAbsolutePath
  }
}
