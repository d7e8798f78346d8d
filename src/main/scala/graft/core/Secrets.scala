package graft.core

/** O14: secret/config fetch — the engine analogue of the reference's
  * Secret Manager bootstrap (`access_secret_version`,
  * gcp_function.py:33-38), which resolves `SECRET_NAME + "/versions/" +
  * version_id` to a payload string before any warehouse work starts.
  *
  * A Spark library has no managed secret store; the deployment-neutral
  * equivalent is environment-backed lookup (what cluster launchers,
  * k8s secrets, and CI vaults all materialize into). Secret `name` at
  * `version` resolves to the env key
  * `GRAFT_SECRET_<NAME>` (version "latest") or
  * `GRAFT_SECRET_<NAME>__V<VERSION>` (pinned version),
  * with `name` sanitized by the same identifier rule as every other
  * engine name ([[Names.sanitizeName]], upper-cased).
  */
object Secrets {

  def envKey(name: String, version: String = "latest"): String = {
    val base = "GRAFT_SECRET_" + Names.sanitizeName(name).toUpperCase
    if (version == "latest") base
    // versions are labels, not identifiers: no leading-digit rule
    else s"${base}__V${version.toUpperCase.replaceAll("[^A-Z0-9]", "_")}"
  }

  /** Resolve a secret; `env` is injectable for tests. A pinned version
    * resolves ONLY its versioned key — like the reference, asking for a
    * version that was never stored is an error, not a silent fallback.
    */
  def fetch(
      name: String,
      version: String = "latest",
      env: Map[String, String] = sys.env): Option[String] =
    env.get(envKey(name, version))

  /** `access_secret_version` semantics: absence is an error. */
  def fetchOrThrow(
      name: String,
      version: String = "latest",
      env: Map[String, String] = sys.env): String =
    fetch(name, version, env).getOrElse(
      throw new NoSuchElementException(
        s"secret '$name' (version $version) not found: set ${envKey(name, version)}"))
}
