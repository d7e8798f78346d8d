package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** O14 secret/config shim (gcp_function.py:33-38 analogue). */
class SecretsSpec extends AnyFunSuite {

  private val env = Map(
    "GRAFT_SECRET_DB_PASSWORD" -> "hunter2",
    "GRAFT_SECRET_DB_PASSWORD__V2" -> "hunter3",
    "GRAFT_SECRET_STAGING_DATABASE" -> "stg")

  test("latest version resolves the base key") {
    assert(Secrets.fetch("db_password", env = env).contains("hunter2"))
  }

  test("names are sanitized like every other identifier") {
    assert(Secrets.fetch("db-password", env = env).contains("hunter2"))
    assert(Secrets.envKey("db password!") == "GRAFT_SECRET_DB_PASSWORD_")
  }

  test("pinned version resolves only its versioned key") {
    assert(Secrets.fetch("db_password", version = "2", env = env).contains("hunter3"))
    // a version that was never stored is absent, never a silent fallback
    assert(Secrets.fetch("db_password", version = "9", env = env).isEmpty)
  }

  test("fetchOrThrow on absent secret names the env key to set") {
    val e = intercept[NoSuchElementException] {
      Secrets.fetchOrThrow("missing_one", env = env)
    }
    assert(e.getMessage.contains("GRAFT_SECRET_MISSING_ONE"))
  }

  test("config wiring: ingest staging database resolves through the shim") {
    assert(Secrets.fetch("staging_database", env = env).contains("stg"))
    // process env has no override → engine default
    assert(graft.ops.Ingest.defaultDatabase == "staging")
  }
}
