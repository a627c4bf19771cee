package graft.api

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.json.Json
import graft.store.TwinStore

/** AuthN/AuthZ + multi-tier rate limiting over a real socket, mirroring
  * the reference's Authorization test suite surface
  * (ApiService.Test/Authorization: PermissionTests,
  * PermissionParserTests, ClaimsPermissionProviderTests,
  * CompositePermissionProviderTests, ApiPermissionProviderTests) plus the
  * middleware behaviors (DatabaseProtectionMiddleware,
  * RateLimitingConfiguration): 401 without/with-bad token, 403 wrong
  * scope, 200 valid token per route class, wildcard grants, per-tier
  * 429s, per-user concurrency cap. */
class AuthSpec extends AnyFunSuite {
  import Auth._

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val client = HttpClient.newHttpClient()
  private val secret = "spec-secret"
  private val cfg = AuthConfig(secret, "https://issuer.example", "graft-api")

  private def token(perms: Seq[String], subject: String = "user-1",
      expiresIn: Long = 3600): String =
    mintToken(secret, cfg.issuer, cfg.audience, subject, perms,
      expiresInSeconds = expiresIn)

  private def req(base: String, path: String, tok: Option[String]): HttpRequest.Builder = {
    val b = HttpRequest.newBuilder(URI.create(s"$base$path"))
      .header("Content-Type", "application/json")
    tok.fold(b)(t => b.header("Authorization", s"Bearer $t"))
  }

  private def send(r: HttpRequest): HttpResponse[String] =
    client.send(r, HttpResponse.BodyHandlers.ofString())

  private def withApi[T](auth: Option[AuthConfig] = Some(cfg),
      provider: Option[PermissionProvider] = None,
      protection: Option[Protection] = None)(f: String => T): T = {
    val api = new HttpApi(new TwinStore(), () => spark,
      auth = auth, permissionProvider = provider, protection = protection)
    api.start()
    try f(s"http://127.0.0.1:${api.port}")
    finally api.stop()
  }

  // ---------- permission model (PermissionTests/PermissionParserTests) ----------

  test("permission parse + wildcard grants match the reference model") {
    assert(PermissionParser.parse("digitaltwins/read")
      .contains(Permission(Resource.DigitalTwins, Action.Read)))
    assert(PermissionParser.parse("digitaltwins/relationships/write")
      .contains(Permission(Resource.Relationships, Action.Write)))
    assert(PermissionParser.parse("jobs/imports/cancel/action")
      .contains(Permission(Resource.JobsImports, Action.Act)))
    assert(PermissionParser.parse("digitaltwins/commands/write")
      .contains(Permission(Resource.DigitalTwins, Action.Write)))
    assert(PermissionParser.parse("models/*")
      .contains(Permission(Resource.Models, Action.Wildcard)))
    // invalid entries parse to None and are skipped by parseMany
    assert(PermissionParser.parse("").isEmpty)
    assert(PermissionParser.parse("digitaltwins").isEmpty)
    assert(PermissionParser.parse("nope/read").isEmpty)
    assert(PermissionParser.parse("digitaltwins/frobnicate").isEmpty)
    assert(PermissionParser.parseMany(
      Seq("models/read", "bogus", "query/action")).size == 2)
    // grants: wildcard covers every action on its resource, nothing else
    val wild = Permission(Resource.Models, Action.Wildcard)
    assert(wild.grants(Permission(Resource.Models, Action.Delete)))
    assert(!wild.grants(Permission(Resource.Query, Action.Act)))
    assert(!Permission(Resource.Models, Action.Read)
      .grants(Permission(Resource.Models, Action.Write)))
  }

  test("JWT validation: signature, expiry, issuer, audience") {
    def check(t: String) = validateBearer(Some(s"Bearer $t"), cfg)
    assert(check(token(Seq("models/read"))).isRight)
    assert(validateBearer(None, cfg).isLeft)
    assert(validateBearer(Some("Basic abc"), cfg).isLeft)
    assert(check("not.a.jwt").isLeft)
    assert(check(token(Nil, expiresIn = -10)).swap.toOption.get.contains("expired"))
    assert(check(mintToken("other-secret", cfg.issuer, cfg.audience, "u"))
      .swap.toOption.get.contains("signature"))
    assert(check(mintToken(secret, "https://evil.example", cfg.audience, "u"))
      .swap.toOption.get.contains("issuer"))
    assert(check(mintToken(secret, cfg.issuer, "other-api", "u"))
      .swap.toOption.get.contains("audience"))
    // audience may be an array (aud: [..]) — hand-build that payload
    val arrTok = {
      val h = java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(
        """{"alg":"HS256","typ":"JWT"}""".getBytes("UTF-8"))
      val now = System.currentTimeMillis() / 1000
      val p = java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(
        s"""{"iss":"${cfg.issuer}","aud":["x","graft-api"],"sub":"u","exp":${now + 60}}"""
          .getBytes("UTF-8"))
      val mac = javax.crypto.Mac.getInstance("HmacSHA256")
      mac.init(new javax.crypto.spec.SecretKeySpec(secret.getBytes("UTF-8"), "HmacSHA256"))
      val sig = java.util.Base64.getUrlEncoder.withoutPadding
        .encodeToString(mac.doFinal(s"$h.$p".getBytes("UTF-8")))
      s"$h.$p.$sig"
    }
    assert(check(arrTok).isRight)
  }

  test("token without exp is rejected (RequireExpirationTime parity)") {
    // mintToken always stamps exp — hand-build an exp-less payload: a
    // signed token with no expiry must not become a permanent credential
    def expless(secretKey: String): String = {
      val h = java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(
        """{"alg":"HS256","typ":"JWT"}""".getBytes("UTF-8"))
      val p = java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(
        s"""{"iss":"${cfg.issuer}","aud":"graft-api","sub":"u"}""".getBytes("UTF-8"))
      val mac = javax.crypto.Mac.getInstance("HmacSHA256")
      mac.init(new javax.crypto.spec.SecretKeySpec(secretKey.getBytes("UTF-8"), "HmacSHA256"))
      val sig = java.util.Base64.getUrlEncoder.withoutPadding
        .encodeToString(mac.doFinal(s"$h.$p".getBytes("UTF-8")))
      s"$h.$p.$sig"
    }
    val r = validateBearer(Some(s"Bearer ${expless(secret)}"), cfg)
    assert(r.swap.toOption.get.contains("expiry"), s"expected missing-expiry rejection: $r")
    // opt-out flag restores the lenient mode
    assert(validateBearer(Some(s"Bearer ${expless(secret)}"),
      cfg.copy(requireExpiration = false)).isRight)
  }

  test("RS256 against a local JWKS: accept, bad sig, wrong kid, expired") {
    import java.security.{KeyPairGenerator, Signature}
    import java.security.interfaces.{RSAPrivateKey, RSAPublicKey}
    def b64(b: Array[Byte]) =
      java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(b)
    def unsignedBigEndian(i: java.math.BigInteger): Array[Byte] = {
      val raw = i.toByteArray
      if (raw(0) == 0) raw.drop(1) else raw // strip the sign byte
    }
    val gen = KeyPairGenerator.getInstance("RSA")
    gen.initialize(2048)
    val pair = gen.generateKeyPair()
    val rogue = gen.generateKeyPair()
    val pub = pair.getPublic.asInstanceOf[RSAPublicKey]
    val jwks =
      s"""{"keys":[{"kty":"RSA","kid":"key-1","use":"sig","alg":"RS256",
         |"n":"${b64(unsignedBigEndian(pub.getModulus))}",
         |"e":"${b64(unsignedBigEndian(pub.getPublicExponent))}"}]}""".stripMargin
    val rsCfg = cfg.copy(jwksJson = Some(jwks))
    def mint(priv: RSAPrivateKey, kid: String, expiresIn: Long = 3600): String = {
      val now = System.currentTimeMillis() / 1000
      val h = b64(s"""{"alg":"RS256","typ":"JWT","kid":"$kid"}""".getBytes("UTF-8"))
      val p = b64((s"""{"iss":"${cfg.issuer}","aud":"graft-api","sub":"u",""" +
        s""""exp":${now + expiresIn}}""").getBytes("UTF-8"))
      val s = Signature.getInstance("SHA256withRSA")
      s.initSign(priv)
      s.update(s"$h.$p".getBytes("UTF-8"))
      s"$h.$p.${b64(s.sign())}"
    }
    val priv = pair.getPrivate.asInstanceOf[RSAPrivateKey]
    def check(t: String, c: AuthConfig = rsCfg) = validateBearer(Some(s"Bearer $t"), c)
    assert(check(mint(priv, "key-1")).isRight)
    assert(check(mint(rogue.getPrivate.asInstanceOf[RSAPrivateKey], "key-1"))
      .swap.toOption.get.contains("signature"))
    assert(check(mint(priv, "other-kid"))
      .swap.toOption.get.contains("unknown signing key"))
    assert(check(mint(priv, "key-1", expiresIn = -10))
      .swap.toOption.get.contains("expired"))
    // without a configured JWKS the algorithm is rejected outright
    assert(check(mint(priv, "key-1"), cfg)
      .swap.toOption.get.contains("JWKS"))
    // HS256 continues to validate under the same config
    assert(check(token(Seq("models/read")), rsCfg).isRight)
  }

  // ---------- providers (Claims/Api/Composite provider tests) ----------

  test("claims, api and composite providers aggregate and cache") {
    val principal = validateBearer(
      Some(s"Bearer ${token(Seq("models/read", "junk"))}"), cfg).toOption.get
    assert(new ClaimsPermissionProvider().permissionsFor(principal) ==
      Set(Permission(Resource.Models, Action.Read)))

    var calls = 0
    val api = new ApiPermissionProvider(
      fetch = { sub => calls += 1; Seq(s"query/action") },
      cacheTtlSeconds = 300)
    assert(api.permissionsFor(principal) ==
      Set(Permission(Resource.Query, Action.Act)))
    api.permissionsFor(principal)
    assert(calls == 1, "second lookup must hit the per-subject cache")

    val throwing = new PermissionProvider {
      def permissionsFor(p: Principal) = throw new RuntimeException("down")
    }
    val composite = new CompositePermissionProvider(
      Seq(throwing, new ClaimsPermissionProvider(), api))
    assert(composite.permissionsFor(principal) == Set(
      Permission(Resource.Models, Action.Read),
      Permission(Resource.Query, Action.Act)))
  }

  // ---------- HTTP integration: 401/403/200 per route class ----------

  test("every route class: 401 without token, 403 wrong scope, 200 with scope") {
    withApi() { base =>
      val routes = Seq(
        // (method, path, body, the permission that unlocks it)
        ("GET", "/digitaltwins/nope", None, "digitaltwins/read"),
        ("GET", "/digitaltwins/nope/relationships", None, "digitaltwins/relationships/read"),
        ("POST", "/query", Some("""{"query":"SELECT * FROM digitaltwins"}"""), "query/action"),
        ("GET", "/models", None, "models/read"),
        ("GET", "/jobs/imports", None, "jobs/imports/read"))
      for ((method, path, bodyOpt, perm) <- routes) {
        def build(tok: Option[String]) = {
          val b = req(base, path, tok)
          (bodyOpt match {
            case Some(body) => b.method(method, HttpRequest.BodyPublishers.ofString(body))
            case None => b.method(method, HttpRequest.BodyPublishers.noBody())
          }).build()
        }
        val noTok = send(build(None))
        assert(noTok.statusCode() == 401, s"$method $path without token: ${noTok.body()}")
        assert(noTok.headers().firstValue("WWW-Authenticate").isPresent)
        val wrong = send(build(Some(token(Seq("digitaltwins/commands/write")))))
        assert(wrong.statusCode() == 403, s"$method $path wrong scope: ${wrong.body()}")
        assert(Json.parse(wrong.body()).get("error").get("code").asText() == "Forbidden")
        val right = send(build(Some(token(Seq(perm)))))
        // 200 family or domain-level 404 (missing twin) — never 401/403
        assert(right.statusCode() != 401 && right.statusCode() != 403,
          s"$method $path with $perm: ${right.statusCode()} ${right.body()}")
      }
    }
  }

  test("PUT/DELETE on twin id 'search' need write/delete scope, not read") {
    // POST /digitaltwins/search is the read-scoped hybrid-search route;
    // every other verb on that path is a twin op on the literal id
    // "search" and must keep the method-derived permission — a read-only
    // principal must not be able to write through the search path.
    withApi() { base =>
      val readTok = Some(token(Seq("digitaltwins/read")))
      val put = send(req(base, "/digitaltwins/search", readTok)
        .PUT(HttpRequest.BodyPublishers.ofString(
          """{"$metadata":{"$model":"dtmi:x;1"}}""")).build())
      assert(put.statusCode() == 403, s"read scope must not PUT: ${put.body()}")
      val del = send(req(base, "/digitaltwins/search", readTok)
        .DELETE().build())
      assert(del.statusCode() == 403, s"read scope must not DELETE: ${del.body()}")
      // the search POST itself stays readable with read scope (404/400
      // family fine, never 403)
      val search = send(req(base, "/digitaltwins/search", readTok)
        .POST(HttpRequest.BodyPublishers.ofString(
          """{"vector":[1.0]}""")).build())
      assert(search.statusCode() != 403, s"search must allow read scope")
    }
  }

  test("wildcard + write scopes unlock writes; reads stay forbidden without read") {
    withApi() { base =>
      val model =
        """[{"@id":"dtmi:auth:Thing;1","@type":"Interface",
          |"@context":"dtmi:dtdl:context;3","contents":[]}]""".stripMargin
      // models/write unlocks POST /models
      val created = send(req(base, "/models", Some(token(Seq("models/write"))))
        .POST(HttpRequest.BodyPublishers.ofString(model)).build())
      assert(created.statusCode() == 201, created.body())
      // …but not GET /models
      val denied = send(req(base, "/models", Some(token(Seq("models/write"))))
        .GET().build())
      assert(denied.statusCode() == 403)
      // digitaltwins/* wildcard unlocks twin PUT and GET
      val wild = Some(token(Seq("digitaltwins/*")))
      val put = send(req(base, "/digitaltwins/t1", wild).PUT(
        HttpRequest.BodyPublishers.ofString(
          """{"$metadata":{"$model":"dtmi:auth:Thing;1"}}""")).build())
      assert(put.statusCode() == 200, put.body())
      assert(send(req(base, "/digitaltwins/t1", wild).GET().build()).statusCode() == 200)
      // twin wildcard does NOT leak onto the relationships resource
      val rels = send(req(base, "/digitaltwins/t1/relationships", wild).GET().build())
      assert(rels.statusCode() == 403)
    }
  }

  test("authorization disabled: any authenticated caller passes policies") {
    withApi(auth = Some(cfg.copy(authorizationEnabled = false))) { base =>
      val r = send(req(base, "/models", Some(token(Nil))).GET().build())
      assert(r.statusCode() == 200, r.body())
      assert(send(req(base, "/models", None).GET().build()).statusCode() == 401,
        "authentication still required")
    }
  }

  // ---------- rate limits + DB protection ----------

  test("per-tier 429: admin window exhausts independently of light") {
    val prot = new Protection(Protection.ProtectionConfig(
      limits = Protection.Limits(adminPermits = 2, adminWindowSeconds = 3600,
        lightPermits = 1000)))
    withApi(auth = None, protection = Some(prot)) { base =>
      assert(send(req(base, "/models", None).GET().build()).statusCode() == 200)
      assert(send(req(base, "/models", None).GET().build()).statusCode() == 200)
      val third = send(req(base, "/models", None).GET().build())
      assert(third.statusCode() == 429, third.body())
      assert(third.headers().firstValue("Retry-After").isPresent)
      assert(third.body().contains("admin"))
      // the light tier is unaffected by the exhausted admin window
      val twin = send(req(base, "/digitaltwins/missing", None).GET().build())
      assert(twin.statusCode() == 404, s"light tier throttled: ${twin.body()}")
    }
  }

  test("global window rejects everything once exhausted") {
    val prot = new Protection(Protection.ProtectionConfig(
      limits = Protection.Limits(globalPermits = 3, globalWindowSeconds = 3600)))
    withApi(auth = None, protection = Some(prot)) { base =>
      (1 to 3).foreach(_ =>
        assert(send(req(base, "/models", None).GET().build()).statusCode() == 200))
      val r = send(req(base, "/models", None).GET().build())
      assert(r.statusCode() == 429 && r.body().contains("global"))
    }
  }

  test("per-user concurrency cap (DatabaseProtectionMiddleware)") {
    val prot = new Protection(Protection.ProtectionConfig(
      maxConcurrentRequestsPerUser = 2))
    // drive admit/release directly — a socket test would need slow
    // handlers to hold requests open; the decision layer is what the
    // middleware contributes
    assert(prot.admit("GET", List("models"), "u") == Protection.Admitted)
    assert(prot.admit("GET", List("models"), "u") == Protection.Admitted)
    prot.admit("GET", List("models"), "u") match {
      case Protection.Rejected(_, reason) =>
        assert(reason.contains("concurrent"))
      case other => fail(s"expected concurrency rejection, got $other")
    }
    // another user is unaffected; release frees a slot
    assert(prot.admit("GET", List("models"), "v") == Protection.Admitted)
    prot.release("u")
    assert(prot.admit("GET", List("models"), "u") == Protection.Admitted)
  }

  test("per-user rejections do not erode the shared windows") {
    // concurrency cap 1, global permits 2: the second (concurrency-
    // rejected) admit must NOT consume a global permit, so after release
    // a second successful admit still fits the global window.
    val prot = new Protection(Protection.ProtectionConfig(
      limits = Protection.Limits(globalPermits = 2, globalWindowSeconds = 3600),
      maxConcurrentRequestsPerUser = 1))
    assert(prot.admit("GET", List("models"), "u") == Protection.Admitted)
    prot.admit("GET", List("models"), "u") match {
      case Protection.Rejected(_, reason) => assert(reason.contains("concurrent"))
      case other => fail(s"expected concurrency rejection, got $other")
    }
    prot.release("u")
    assert(prot.admit("GET", List("models"), "u") == Protection.Admitted,
      "concurrency-rejected request consumed a global permit")
    // concurrency count was not leaked by the rejected admit
    prot.release("u")
    assert(prot.concurrentFor("u") == 0)
  }

  test("tier rejection refunds the global permit") {
    // admin permits 1, global permits 3: an admin-tier 429 must hand its
    // global permit back, leaving 2 for other tiers.
    val prot = new Protection(Protection.ProtectionConfig(
      limits = Protection.Limits(globalPermits = 3, globalWindowSeconds = 3600,
        adminPermits = 1, adminWindowSeconds = 3600, lightPermits = 100)))
    assert(prot.admit("GET", List("models"), "u") == Protection.Admitted)
    prot.admit("GET", List("models"), "u") match {
      case Protection.Rejected(_, reason) => assert(reason.contains("admin"))
      case other => fail(s"expected admin tier rejection, got $other")
    }
    // two global permits must remain (1 used by the admitted request)
    assert(prot.admit("GET", List("digitaltwins", "x"), "u") == Protection.Admitted)
    assert(prot.admit("GET", List("digitaltwins", "x"), "u") == Protection.Admitted)
    prot.admit("GET", List("digitaltwins", "x"), "u") match {
      case Protection.Rejected(_, reason) => assert(reason.contains("global"))
      case other => fail(s"expected global exhaustion, got $other")
    }
  }

  test("query complexity budget: heavy charges exhaust the window") {
    val prot = new Protection(Protection.ProtectionConfig(
      maxQueryComplexityPerWindow = 100.0,
      queryComplexityWindowSeconds = 3600))
    assert(prot.admit("POST", List("query"), "u") == Protection.Admitted)
    prot.recordQueryCharge("u", 500.0) // one expensive query
    prot.release("u")
    prot.admit("POST", List("query"), "u") match {
      case Protection.Rejected(_, reason) =>
        assert(reason.contains("query units"), reason)
      case other => fail(s"expected complexity rejection, got $other")
    }
    // non-query routes are not budgeted
    assert(prot.admit("GET", List("models"), "u") == Protection.Admitted)
  }
}
