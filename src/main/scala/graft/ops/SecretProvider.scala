package graft.ops

/** Named-secret resolution for column privacy.
  *
  * The reference wires a NAMED secret into its global config
  * (config/globalConfig.json:8, `secret_name: "cape_privacy_key"`) rather
  * than a raw key — the privacy plane resolves the key at use time from a
  * secret store, and the stored name stays valid across key rotations.
  * This trait is that indirection, engine-side.
  *
  * Versions are STABLE IDENTIFIERS, not list positions: a secret exposes
  * `(version, key)` pairs, and destroying a retired version removes its
  * pair without renumbering the survivors. That invariant is what makes
  * `<col>_key_ver` values stored beside ciphertext durable — with
  * positional versions, deleting an old key would silently shift every
  * later version onto the wrong key and decrypt the lake to garbage or
  * nulls. Rows whose recorded version is no longer resolvable must FAIL
  * (Privacy.decryptWith raises), never decrypt to null.
  */
trait SecretProvider {
  /** Live `(version, key)` pairs of a named secret, ascending by version;
    * the highest version is current. Must be non-empty for a known name;
    * unknown names throw. Versions are positive and unique.
    */
  def secret(name: String): Seq[(Int, String)]

  final def currentVersion(name: String): Int = {
    val vs = secret(name)
    require(vs.nonEmpty, s"secret '$name' has no live versions")
    vs.map(_._1).max
  }

  final def currentKey(name: String): String = key(name, currentVersion(name))

  final def key(name: String, version: Int): String =
    secret(name).collectFirst { case (`version`, k) => k }.getOrElse(
      throw new NoSuchElementException(
        s"secret '$name' has no live version $version " +
          s"(live: ${secret(name).map(_._1).mkString(",")})"))
}

/** Config-backed provider for tests and embedded use. */
class InMemorySecretProvider(entries: Map[String, Seq[(Int, String)]])
    extends SecretProvider {
  override def secret(name: String): Seq[(Int, String)] =
    entries.getOrElse(name,
      throw new NoSuchElementException(s"unknown secret '$name'"))
      .sortBy(_._1)
}

object SecretProvider {
  /** Environment-backed provider: secret `cape_privacy_key` resolves from
    * `GRAFT_SECRET_CAPE_PRIVACY_KEY`. The value is a comma-separated
    * version list — either explicit `ver:key` pairs (`1:oldk,3:newk`;
    * gaps mark destroyed versions) or bare keys, which are numbered
    * positionally 1..n (only safe while no version has ever been
    * destroyed). The deployment analog of the reference's secret-store
    * lookup, with the same named indirection.
    */
  def fromEnv(env: Map[String, String] = sys.env): SecretProvider =
    new SecretProvider {
      override def secret(name: String): Seq[(Int, String)] = {
        val envKey = "GRAFT_SECRET_" + name.toUpperCase.replaceAll("[^A-Z0-9]", "_")
        val raw = env.get(envKey) match {
          case Some(v) if v.nonEmpty => v.split(",").toSeq
          case _ => throw new NoSuchElementException(
            s"secret '$name' not found (env $envKey unset)")
        }
        val explicit = raw.forall(_.matches("\\d+:.+"))
        require(explicit || raw.forall(!_.matches("\\d+:.+")),
          s"secret '$name': mixed ver:key and bare entries in $envKey")
        val pairs =
          if (explicit) raw.map { e =>
            val Array(v, k) = e.split(":", 2)
            (v.toInt, k)
          }
          else raw.zipWithIndex.map { case (k, i) => (i + 1, k) }
        require(pairs.map(_._1).distinct.length == pairs.length,
          s"secret '$name': duplicate versions in $envKey")
        pairs.sortBy(_._1)
      }
    }
}
