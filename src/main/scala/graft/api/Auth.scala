package graft.api

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec
import com.fasterxml.jackson.databind.JsonNode
import graft.json.Json

/** AuthN/AuthZ for [[HttpApi]] — the reference service's JWT-bearer +
  * permission-policy stack (ApiService/Program.cs:151-258,
  * ServiceDefaults/Authorization) re-expressed over the JDK.
  *
  * Authentication is a self-contained JWT validation (signature,
  * `exp`/`nbf`, `iss`, `aud`) for two algorithms: HS256 (shared secret)
  * and RS256 against a locally-configured JWKS document — the reference
  * delegates RS256 key *fetch* to an OIDC authority's metadata endpoint,
  * which a zero-egress build cannot reach, but the RSA verification
  * itself is pure JDK math; operators supply the authority's JWKS JSON
  * via config/disk instead of a URL. Both algorithms share the same
  * claim rules. Authorization mirrors the reference's permission
  * model exactly: `resource/action` strings
  * (Authorization/Models/Permission.cs:31-80) with wildcard grants,
  * parsed leniently (invalid entries skipped,
  * Models/PermissionParser.cs:100-115), drawn from token claims
  * (ClaimsPermissionProvider.cs:38-62) and/or an external permission API
  * with per-subject caching (ApiPermissionProvider.cs:105-140), unioned
  * by a composite that survives provider failures
  * (CompositePermissionProvider.cs:21-56). */
object Auth {

  /** Resource kinds, aligned with Azure Digital Twins data-plane scopes
    * (reference Authorization/Models/ResourceType.cs). */
  sealed abstract class Resource(val wire: String)
  object Resource {
    case object Query extends Resource("query")
    case object DigitalTwins extends Resource("digitaltwins")
    case object Relationships extends Resource("digitaltwins/relationships")
    case object Models extends Resource("models")
    case object JobsImports extends Resource("jobs/imports")
    case object JobsDeletions extends Resource("jobs/deletions")
  }

  /** Actions (reference Authorization/Models/PermissionAction.cs). */
  sealed abstract class Action(val wire: String)
  object Action {
    case object Read extends Action("read")
    case object Write extends Action("write")
    case object Delete extends Action("delete")
    case object Act extends Action("action")
    case object Wildcard extends Action("*")
  }

  /** A `resource/action` permission; `grants` implements the wildcard
    * rule (Permission.cs:66-80): same resource, and either wildcard or
    * exact action match. */
  final case class Permission(resource: Resource, action: Action) {
    def grants(required: Permission): Boolean =
      resource == required.resource &&
        (action == Action.Wildcard || action == required.action)
    override def toString: String = s"${resource.wire}/${action.wire}"
  }

  /** Lenient `resource/action` parser (PermissionParser.cs:16-77): action
    * is the last `/`-segment, the rest is the resource path; aliases
    * (`digitaltwins/commands`, `jobs/imports/cancel`) fold into their
    * parent resource; anything unrecognized parses to None. */
  object PermissionParser {
    def parse(s: String): Option[Permission] = {
      val parts = Option(s).getOrElse("").split("/").filter(_.nonEmpty)
      if (parts.length < 2) return None
      val action = parts.last.toLowerCase match {
        case "read" => Action.Read
        case "write" => Action.Write
        case "delete" => Action.Delete
        case "action" => Action.Act
        case "*" => Action.Wildcard
        case _ => return None
      }
      val resource = parts.init.mkString("/").toLowerCase match {
        case "query" => Resource.Query
        case "digitaltwins" => Resource.DigitalTwins
        case "digitaltwins/relationships" => Resource.Relationships
        case "digitaltwins/commands" => Resource.DigitalTwins
        case "models" => Resource.Models
        case "jobs/imports" => Resource.JobsImports
        case "jobs/imports/cancel" => Resource.JobsImports
        case "jobs/deletions" => Resource.JobsDeletions
        case _ => return None
      }
      Some(Permission(resource, action))
    }
    def parseMany(ss: Iterable[String]): Set[Permission] =
      ss.iterator.flatMap(parse).toSet
  }

  /** Validated token identity: subject + raw claims. */
  final case class Principal(subject: String, claims: JsonNode)

  /** Authentication settings (reference `Authentication:*` config keys:
    * Program.cs:154-173). `authorizationEnabled=false` mirrors the
    * reference's permissive mode — authenticated callers pass every
    * policy (Program.cs:242-247). */
  final case class AuthConfig(
      secret: String,
      issuer: String,
      audience: String,
      permissionsClaimName: String = "permissions",
      authorizationEnabled: Boolean = true,
      requireExpiration: Boolean = true,
      /** RFC 7517 JWKS document (the `{"keys":[...]}` JSON an OIDC
        * authority serves at jwks_uri), enabling RS256 tokens. */
      jwksJson: Option[String] = None,
      clock: () => Long = () => System.currentTimeMillis() / 1000)

  private def b64url(bytes: Array[Byte]): String =
    java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(bytes)
  private def b64urlDecode(s: String): Array[Byte] =
    java.util.Base64.getUrlDecoder.decode(s)

  private def hmac(secret: String, signingInput: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(secret.getBytes("UTF-8"), "HmacSHA256"))
    mac.doFinal(signingInput.getBytes("UTF-8"))
  }

  /** kid → RSA public key from a JWKS document; parsed once per distinct
    * document (the config string is stable for an API's lifetime). */
  private val jwksCache = new java.util.concurrent.ConcurrentHashMap[
    String, Map[String, java.security.interfaces.RSAPublicKey]]()

  private def jwksKeys(jwksJson: String): Map[String, java.security.interfaces.RSAPublicKey] =
    jwksCache.computeIfAbsent(jwksJson, { s =>
      import scala.jdk.CollectionConverters._
      val keys = Option(Json.parse(s).get("keys")).toSeq
        .flatMap(_.elements().asScala)
      keys.flatMap { k =>
        for {
          kty <- Option(k.get("kty")).map(_.asText()) if kty == "RSA"
          n <- Option(k.get("n")).map(_.asText())
          e <- Option(k.get("e")).map(_.asText())
        } yield {
          val spec = new java.security.spec.RSAPublicKeySpec(
            new java.math.BigInteger(1, b64urlDecode(n)),
            new java.math.BigInteger(1, b64urlDecode(e)))
          Option(k.get("kid")).map(_.asText()).getOrElse("") ->
            java.security.KeyFactory.getInstance("RSA").generatePublic(spec)
              .asInstanceOf[java.security.interfaces.RSAPublicKey]
        }
      }.toMap
    })

  /** Validate `Authorization: Bearer <jwt>`: well-formed three-part
    * compact JWS, HS256 (constant-time HMAC compare) or RS256 (JWKS kid
    * lookup + SHA256withRSA) signature check, then the reference's
    * TokenValidationParameters (Program.cs:163-171) — issuer, audience
    * (string or array), expiry (required), not-before. */
  def validateBearer(header: Option[String], cfg: AuthConfig): Either[String, Principal] = {
    val token = header match {
      case Some(h) if h.regionMatches(true, 0, "Bearer ", 0, 7) => h.drop(7).trim
      case Some(_) => return Left("authorization header is not a Bearer token")
      case None => return Left("missing Authorization header")
    }
    val parts = token.split("\\.")
    if (parts.length != 3) return Left("malformed token")
    val (h64, p64, s64) = (parts(0), parts(1), parts(2))
    val (headerJson, payload) =
      try (Json.parse(new String(b64urlDecode(h64), "UTF-8")),
        Json.parse(new String(b64urlDecode(p64), "UTF-8")))
      catch { case _: Exception => return Left("malformed token") }
    val given = try b64urlDecode(s64)
      catch { case _: Exception => return Left("malformed token signature") }
    Option(headerJson.get("alg")).map(_.asText()) match {
      case Some("HS256") =>
        if (!java.security.MessageDigest.isEqual(hmac(cfg.secret, s"$h64.$p64"), given))
          return Left("invalid token signature")
      case Some("RS256") =>
        val jwks = cfg.jwksJson match {
          case Some(j) => j
          case None => return Left("no JWKS configured for RS256 tokens")
        }
        val keys = try jwksKeys(jwks)
          catch { case _: Exception => return Left("malformed JWKS document") }
        val key = Option(headerJson.get("kid")).map(_.asText()) match {
          case Some(kid) => keys.get(kid)
          // a kid-less token is only unambiguous against a 1-key JWKS
          case None if keys.size == 1 => keys.values.headOption
          case None => None
        }
        key match {
          case None => return Left("unknown signing key")
          case Some(pub) =>
            val v = java.security.Signature.getInstance("SHA256withRSA")
            v.initVerify(pub)
            v.update(s"$h64.$p64".getBytes("UTF-8"))
            val ok = try v.verify(given) catch { case _: Exception => false }
            if (!ok) return Left("invalid token signature")
        }
      case _ => return Left("unsupported token algorithm")
    }
    val now = cfg.clock()
    // The reference's JwtBearer stack defaults RequireExpirationTime=true:
    // a signed token without `exp` would otherwise never expire.
    val exp = Option(payload.get("exp")).map(_.asLong())
    if (cfg.requireExpiration && exp.isEmpty) return Left("token missing expiry")
    if (exp.exists(_ <= now)) return Left("token expired")
    if (Option(payload.get("nbf")).map(_.asLong()).exists(_ > now))
      return Left("token not yet valid")
    if (!Option(payload.get("iss")).map(_.asText()).contains(cfg.issuer))
      return Left("invalid token issuer")
    val audOk = Option(payload.get("aud")).exists { a =>
      if (a.isArray) {
        import scala.jdk.CollectionConverters._
        a.elements().asScala.exists(_.asText() == cfg.audience)
      } else a.asText() == cfg.audience
    }
    if (!audOk) return Left("invalid token audience")
    val sub = Option(payload.get("sub")).map(_.asText()).getOrElse("")
    Right(Principal(sub, payload))
  }

  /** Mint an HS256 token — the test-side counterpart of `validateBearer`
    * (the reference's test suites mint through their IdP test doubles). */
  def mintToken(secret: String, issuer: String, audience: String,
      subject: String, permissions: Seq[String] = Nil,
      permissionsClaimName: String = "permissions",
      expiresInSeconds: Long = 3600,
      nowSeconds: Long = System.currentTimeMillis() / 1000): String = {
    val header = """{"alg":"HS256","typ":"JWT"}"""
    val o = Json.obj()
    o.put("iss", issuer)
    o.put("aud", audience)
    o.put("sub", subject)
    o.put("iat", nowSeconds)
    o.put("exp", nowSeconds + expiresInSeconds)
    if (permissions.nonEmpty) {
      val arr = o.putArray(permissionsClaimName)
      permissions.foreach(arr.add)
    }
    val signingInput =
      s"${b64url(header.getBytes("UTF-8"))}.${b64url(Json.render(o).getBytes("UTF-8"))}"
    s"$signingInput.${b64url(hmac(secret, signingInput))}"
  }

  /** A source of permissions for an authenticated principal. */
  trait PermissionProvider {
    def permissionsFor(p: Principal): Set[Permission]
  }

  /** Permissions from the token's own claims array
    * (ClaimsPermissionProvider.cs:38-62); claim name configurable,
    * default "permissions" (Configuration/AuthorizationOptions.cs:24). */
  final class ClaimsPermissionProvider(claimName: String = "permissions")
      extends PermissionProvider {
    def permissionsFor(p: Principal): Set[Permission] =
      Option(p.claims.get(claimName)).map { n =>
        import scala.jdk.CollectionConverters._
        val strings =
          if (n.isArray) n.elements().asScala.map(_.asText()).toSeq
          else Seq(n.asText())
        PermissionParser.parseMany(strings)
      }.getOrElse(Set.empty)
  }

  /** Permissions from an external API, cached per subject for a TTL
    * (ApiPermissionProvider.cs:105-140; cache key `permissions:{userId}`).
    * The HTTP transport is injected — this build has no egress, and the
    * provider's contract is lookup + cache, not a particular client. */
  final class ApiPermissionProvider(
      fetch: String => Seq[String],
      cacheTtlSeconds: Long = 300,
      clock: () => Long = () => System.currentTimeMillis() / 1000)
      extends PermissionProvider {
    private val cache =
      new java.util.concurrent.ConcurrentHashMap[String, (Set[Permission], Long)]()
    def permissionsFor(p: Principal): Set[Permission] = {
      if (p.subject.isEmpty) return Set.empty
      val now = clock()
      Option(cache.get(p.subject)) match {
        case Some((perms, at)) if now - at < cacheTtlSeconds => perms
        case _ =>
          val perms = PermissionParser.parseMany(fetch(p.subject))
          cache.put(p.subject, (perms, now))
          perms
      }
    }
  }

  /** Union of providers; a throwing provider contributes nothing instead
    * of failing the request (CompositePermissionProvider.cs:29-47). */
  final class CompositePermissionProvider(providers: Seq[PermissionProvider])
      extends PermissionProvider {
    def permissionsFor(p: Principal): Set[Permission] =
      providers.flatMap { prov =>
        try prov.permissionsFor(p)
        catch { case _: Exception => Set.empty[Permission] }
      }.toSet
  }
}
