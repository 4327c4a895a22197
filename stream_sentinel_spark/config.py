"""Engine configuration resolved from environment variables.

Parity with the reference's ``JobConfig`` (9 env vars, defaults, and
validation — flink-job/.../JobConfig.java:81-98,244-264; defaults table
README.md:147-157). Env var *names* are kept identical so a user of the
reference can point the same deployment manifest at this engine; the two
Flink-specific names gain spark aliases.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def _env(name: str, default: str, aliases: tuple[str, ...] = ()) -> str:
    for candidate in (name, *aliases):
        value = os.environ.get(candidate)
        if value is not None:
            return value
    return default


@dataclass(frozen=True)
class EngineConfig:
    """Immutable runtime configuration (JobConfig.java:43-79 parity)."""

    kafka_bootstrap_servers: str = "localhost:9092"
    kafka_input_topic: str = "events"
    kafka_alert_topic: str = "alerts"
    kafka_group_id: str = "stream-sentinel"
    parallelism: int = 1
    checkpoint_interval_ms: int = 60_000
    rules_config_path: str = ""
    health_port: int = 8080
    default_key_field: str = "userId"
    # Spark-only additions (not in the reference surface):
    checkpoint_location: str = field(default="/tmp/stream-sentinel-checkpoints")
    shuffle_partitions: int = 32

    def __post_init__(self) -> None:
        self.validate()

    def validate(self) -> None:
        """Fail-fast validation, same constraints as JobConfig.Builder.build
        (JobConfig.java:244-264)."""

        def require_non_blank(value: str, name: str) -> None:
            if value is None or not value.strip():
                raise ValueError(f"{name} must not be null or blank")

        require_non_blank(self.kafka_bootstrap_servers, "kafkaBootstrapServers")
        require_non_blank(self.kafka_input_topic, "kafkaInputTopic")
        require_non_blank(self.kafka_alert_topic, "kafkaAlertTopic")
        require_non_blank(self.kafka_group_id, "kafkaGroupId")
        require_non_blank(self.default_key_field, "defaultKeyField")
        if self.parallelism < 1:
            raise ValueError(f"parallelism must be >= 1, got: {self.parallelism}")
        if self.checkpoint_interval_ms < 1:
            raise ValueError(
                f"checkpointIntervalMs must be >= 1, got: {self.checkpoint_interval_ms}"
            )
        if not 1 <= self.health_port <= 65_535:
            raise ValueError(f"healthPort must be in [1, 65535], got: {self.health_port}")

    @classmethod
    def from_environment(cls) -> "EngineConfig":
        """Resolve from env vars (JobConfig.fromEnvironment,
        JobConfig.java:81-98). Unparseable numerics raise ValueError."""
        try:
            parallelism = int(_env("FLINK_PARALLELISM", "1", ("SPARK_PARALLELISM",)))
            checkpoint_ms = int(
                _env("FLINK_CHECKPOINT_INTERVAL_MS", "60000", ("SPARK_CHECKPOINT_INTERVAL_MS",))
            )
            health_port = int(_env("HEALTH_PORT", "8080"))
        except ValueError as exc:  # NumberFormatException parity
            raise RuntimeError(
                f"Failed to parse numeric environment variable: {exc}"
            ) from exc
        return cls(
            kafka_bootstrap_servers=_env("KAFKA_BOOTSTRAP_SERVERS", "localhost:9092"),
            kafka_input_topic=_env("KAFKA_INPUT_TOPIC", "events"),
            kafka_alert_topic=_env("KAFKA_ALERT_TOPIC", "alerts"),
            kafka_group_id=_env("KAFKA_GROUP_ID", "stream-sentinel"),
            parallelism=parallelism,
            checkpoint_interval_ms=checkpoint_ms,
            rules_config_path=_env("RULES_CONFIG_PATH", ""),
            health_port=health_port,
            default_key_field=_env("DEFAULT_KEY_FIELD", "userId"),
            checkpoint_location=_env(
                "SPARK_CHECKPOINT_LOCATION", "/tmp/stream-sentinel-checkpoints"
            ),
            shuffle_partitions=int(_env("SPARK_SHUFFLE_PARTITIONS", "32")),
        )
