package graft.functions

import java.net.URI
import java.util.concurrent.ConcurrentHashMap

/** One storage scheme's pre-signing strategy (the seam behind
  * `sign_storage_url`). The reference dispatches on the resolved
  * object-store TYPE (reference: crates/datafusion/src/functions/
  * sign_url.rs:178-208 — AmazonS3 / MicrosoftAzure /
  * GoogleCloudStorage sign through their SDK signers, LocalFileSystem
  * and InMemory re-join the URL unsigned, anything else is "not a
  * signing store"). Spark has no object-store registry to downcast, so
  * the equivalent dispatch key here is the URL SCHEME.
  */
trait StorageUrlSigner {
  /** Lower-case URI schemes this signer owns ("" = scheme-less paths). */
  def schemes: Seq[String]

  /** A GET URL for `url` valid for `expiresInSeconds`. */
  def sign(url: URI, expiresInSeconds: Long): String
}

object UrlSigning {

  /** GET expiry, fixed at one hour like the reference
    * (sign_url.rs:135-137, with the same TODO to parameterize). */
  final val ExpiresInSeconds = 3600L

  private val registry = new ConcurrentHashMap[String, StorageUrlSigner]()

  /** Local arm (sign_url.rs:196-208): filesystem and in-memory URLs
    * need no signature and pass through. Scheme-less paths are treated
    * as local too (documented divergence: the reference's URL parser
    * rejects them outright; a bare `/data/x.parquet` is a legitimate
    * local reference on Spark). */
  object LocalSigner extends StorageUrlSigner {
    val schemes: Seq[String] = Seq("", "file")
    def sign(url: URI, expiresInSeconds: Long): String = url.toString
  }

  /** Remote arms: the reference signs via each cloud SDK
    * (sign_url.rs:178-193). This environment is zero-egress — the seam
    * exists, credentials and SDKs don't — so each scheme is a TYPED
    * extension point: plugging in a real signer is one `register(...)`
    * call with an implementation that speaks the store's query-string
    * signing protocol (SigV4 presign for S3, SAS token for Azure, V4
    * signed URL for GCS). */
  private final class UnavailableSigner(val schemes: Seq[String],
      store: String) extends StorageUrlSigner {
    def sign(url: URI, expiresInSeconds: Long): String =
      throw new UnsupportedOperationException(
        s"No signer available for remote store ($store): $url — " +
          s"register a StorageUrlSigner for scheme(s) " +
          schemes.mkString("/"))
  }

  /** Replace/extend a scheme's signer (last registration wins). */
  def register(s: StorageUrlSigner): Unit =
    s.schemes.foreach(sc => registry.put(sc.toLowerCase, s))

  def signerFor(scheme: String): Option[StorageUrlSigner] =
    Option(registry.get(scheme.toLowerCase))

  register(LocalSigner)
  register(new UnavailableSigner(Seq("s3", "s3a", "s3n"), "AmazonS3"))
  register(new UnavailableSigner(
    Seq("abfs", "abfss", "wasb", "wasbs", "az", "adl"), "MicrosoftAzure"))
  register(new UnavailableSigner(Seq("gs"), "GoogleCloudStorage"))

  /** The `sign_storage_url` UDF body. Null and unparseable inputs yield
    * null (the reference leaves unparseable entries unset in the result
    * array, sign_url.rs:104-112); a parseable URL under a scheme with
    * no registered signer is the reference's "not a signing store"
    * error (sign_url.rs:210). */
  private val SchemePrefix = "^([A-Za-z][A-Za-z0-9+.\\-]*):.*$".r

  def signUrl(url: String): String = {
    if (url == null) return null
    val scheme = url match {
      case SchemePrefix(s) => s
      case _ => ""
    }
    val uri =
      try new URI(url)
      catch {
        case _: java.net.URISyntaxException =>
          // a scheme-less path with URI-illegal chars (space, '{', …) is
          // a legitimate LOCAL filesystem path — pass it through like
          // any other local path; a malformed URL under a real scheme
          // yields null (the reference leaves unparseable entries unset)
          if (scheme.isEmpty) return url else return null
      }
    signerFor(scheme) match {
      case Some(s) => s.sign(uri, ExpiresInSeconds)
      case None =>
        throw new UnsupportedOperationException(s"not a signing store: $url")
    }
  }
}
