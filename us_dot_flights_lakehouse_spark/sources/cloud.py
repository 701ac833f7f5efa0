"""Cloud object-store connector configuration (SURVEY.md §2.1 S9).

The reference wires Azure ADLS Gen2 via ``fs.azure.*`` Hadoop confs
(``configs/azure_config.py:57-86,118-129``: OAuth service-principal or
shared-key auth on ``abfss://`` paths). This module generalizes that to
conf-dict builders for the three major stores, to be passed as
``get_spark(extra_confs=...)`` — pure configuration, no SDK imports, so
it is testable without any cloud (the actual JARs ship with a cluster's
Hadoop distribution, not with this library).

Scale note: at 100 TB the connector confs that matter are the committer
(magic committer / abfs flush semantics — rename-free commits) and list
parallelism; defaults below include them.
"""

from __future__ import annotations


def abfss_oauth_confs(
    account: str, client_id: str, client_secret: str, tenant_id: str
) -> dict[str, str]:
    """ADLS Gen2 OAuth2 service-principal auth (reference
    azure_config.py:66-77). Use with abfss://container@account.dfs.core.windows.net paths."""
    host = f"{account}.dfs.core.windows.net"
    endpoint = f"https://login.microsoftonline.com/{tenant_id}/oauth2/token"
    return {
        f"fs.azure.account.auth.type.{host}": "OAuth",
        f"fs.azure.account.oauth.provider.type.{host}": (
            "org.apache.hadoop.fs.azurebfs.oauth2.ClientCredsTokenProvider"
        ),
        f"fs.azure.account.oauth2.client.id.{host}": client_id,
        f"fs.azure.account.oauth2.client.secret.{host}": client_secret,
        f"fs.azure.account.oauth2.client.endpoint.{host}": endpoint,
    }


def abfss_shared_key_confs(account: str, key: str) -> dict[str, str]:
    """ADLS Gen2 shared-key auth (reference azure_config.py:80-86)."""
    host = f"{account}.dfs.core.windows.net"
    return {f"fs.azure.account.key.{host}": key}


def s3a_confs(
    access_key: str | None = None,
    secret_key: str | None = None,
    endpoint: str | None = None,
) -> dict[str, str]:
    """S3A with the magic committer (rename-free task commits — the thing
    that makes massively-parallel writes safe on an object store). Omit
    keys to fall back to the instance-profile credential chain."""
    confs = {
        "fs.s3a.committer.name": "magic",
        "fs.s3a.committer.magic.enabled": "true",
        "spark.sql.sources.commitProtocolClass": (
            "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol"
        ),
        "spark.sql.parquet.output.committer.class": (
            "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter"
        ),
    }
    if access_key:
        confs["fs.s3a.access.key"] = access_key
    if secret_key:
        confs["fs.s3a.secret.key"] = secret_key
    if endpoint:
        confs["fs.s3a.endpoint"] = endpoint
    return confs


def gcs_confs(project_id: str, service_account_json: str | None = None) -> dict[str, str]:
    """GCS connector confs; JSON-keyfile auth when provided, else ADC."""
    confs = {
        "fs.gs.project.id": project_id,
        "fs.AbstractFileSystem.gs.impl": (
            "com.google.cloud.hadoop.fs.gcs.GoogleHadoopFS"
        ),
    }
    if service_account_json:
        confs["google.cloud.auth.service.account.json.keyfile"] = service_account_json
    return confs
