package graft

/** Repo-root resolution shared by the mains that read or write artifacts at
  * the checkout root (Bench's BENCH_LOCAL.json, Verify's `__REPO__` oracle
  * placeholder): `GRAFT_REPO_ROOT` if set, else the nearest ancestor of the
  * cwd containing build.sbt, else the cwd — never a hardcoded path. */
object RepoRoot {
  def resolve(): java.io.File =
    sys.env.get("GRAFT_REPO_ROOT").map(new java.io.File(_)).getOrElse {
      var d = new java.io.File(".").getCanonicalFile
      while (d != null && !new java.io.File(d, "build.sbt").exists())
        d = d.getParentFile
      if (d != null) d else new java.io.File(".").getCanonicalFile
    }
}
