package graft.ops

/** Named-secret resolution for column privacy.
  *
  * The reference wires a NAMED secret into its global config
  * (config/globalConfig.json:8, `secret_name: "cape_privacy_key"`) rather
  * than a raw key — the privacy plane resolves the key at use time from a
  * secret store, and the stored name stays valid across key rotations.
  * This trait is that indirection, engine-side: versions of a secret are
  * ordered, the highest is current, and every older version remains
  * resolvable so ciphertext written under it can still be decrypted
  * (rotation would otherwise orphan every encrypted column in the lake).
  */
trait SecretProvider {
  /** All versions of a named secret, oldest first; last = current.
    * Must be non-empty for a known name; unknown names throw.
    */
  def secret(name: String): Seq[String]

  final def currentVersion(name: String): Int = secret(name).length
  final def currentKey(name: String): String = secret(name).last
  final def key(name: String, version: Int): String = {
    val vs = secret(name)
    require(version >= 1 && version <= vs.length,
      s"secret '$name' has no version $version (1..${vs.length})")
    vs(version - 1)
  }
}

/** Config-backed provider for tests and embedded use. */
class InMemorySecretProvider(entries: Map[String, Seq[String]])
    extends SecretProvider {
  override def secret(name: String): Seq[String] =
    entries.getOrElse(name,
      throw new NoSuchElementException(s"unknown secret '$name'"))
}

object SecretProvider {
  /** Environment-backed provider: secret `cape_privacy_key` resolves from
    * `GRAFT_SECRET_CAPE_PRIVACY_KEY`, whose value is the comma-separated
    * version list (oldest first). The deployment analog of the reference's
    * secret-store lookup, with the same named indirection.
    */
  def fromEnv(env: Map[String, String] = sys.env): SecretProvider =
    new SecretProvider {
      override def secret(name: String): Seq[String] = {
        val envKey = "GRAFT_SECRET_" + name.toUpperCase.replaceAll("[^A-Z0-9]", "_")
        env.get(envKey) match {
          case Some(v) if v.nonEmpty => v.split(",").toSeq
          case _ => throw new NoSuchElementException(
            s"secret '$name' not found (env $envKey unset)")
        }
      }
    }
}
