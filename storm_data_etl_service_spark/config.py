"""Environment-driven service configuration.

Mirrors the reference's config surface — same variable names,
defaults, and validation ranges (reference
internal/config/config.go:12-67, README.md configuration table) — and
maps each knob onto its Spark equivalent:

* ``BATCH_SIZE``           → ``maxOffsetsPerTrigger``
* ``BATCH_FLUSH_INTERVAL`` → processing-time trigger interval
* ``KAFKA_*``              → Kafka source/sink options
* ``SHUTDOWN_TIMEOUT``     → stop/awaitTermination deadline
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field


def _parse_duration_ms(raw: str, name: str) -> int:
    """Go-style duration strings ('500ms', '10s', '2m')."""
    m = re.fullmatch(r"(\d+(?:\.\d+)?)(ms|s|m|h)", raw.strip())
    if not m:
        raise ValueError(f"{name}: invalid duration {raw!r}")
    value, unit = float(m.group(1)), m.group(2)
    return int(value * {"ms": 1, "s": 1000, "m": 60000, "h": 3600000}[unit])


@dataclass
class Config:
    kafka_brokers: list[str] = field(default_factory=lambda: ["kafka:9092"])
    kafka_source_topic: str = "raw-weather-reports"
    kafka_sink_topic: str = "transformed-weather-data"
    kafka_group_id: str = "storm-data-etl"
    http_addr: str = ":8080"
    log_level: str = "info"
    log_format: str = "json"
    shutdown_timeout_ms: int = 10_000
    batch_size: int = 50
    batch_flush_interval_ms: int = 500

    @classmethod
    def load(cls, env: dict[str, str] | None = None) -> "Config":
        """Read configuration from the environment, applying the
        reference's defaults and validation (BATCH_SIZE ∈ [1, 1000],
        positive durations — reference internal/config/config.go:56-64)."""
        e = os.environ if env is None else env
        cfg = cls(
            kafka_brokers=[
                b.strip()
                for b in e.get("KAFKA_BROKERS", "kafka:9092").split(",")
                if b.strip()
            ],
            kafka_source_topic=e.get("KAFKA_SOURCE_TOPIC", "raw-weather-reports"),
            kafka_sink_topic=e.get("KAFKA_SINK_TOPIC", "transformed-weather-data"),
            kafka_group_id=e.get("KAFKA_GROUP_ID", "storm-data-etl"),
            http_addr=e.get("HTTP_ADDR", ":8080"),
            log_level=e.get("LOG_LEVEL", "info"),
            log_format=e.get("LOG_FORMAT", "json"),
            shutdown_timeout_ms=_parse_duration_ms(
                e.get("SHUTDOWN_TIMEOUT", "10s"), "SHUTDOWN_TIMEOUT"
            ),
            batch_size=int(e.get("BATCH_SIZE", "50")),
            batch_flush_interval_ms=_parse_duration_ms(
                e.get("BATCH_FLUSH_INTERVAL", "500ms"), "BATCH_FLUSH_INTERVAL"
            ),
        )
        if not 1 <= cfg.batch_size <= 1000:
            raise ValueError(f"BATCH_SIZE must be in [1, 1000], got {cfg.batch_size}")
        if cfg.batch_flush_interval_ms <= 0:
            raise ValueError("BATCH_FLUSH_INTERVAL must be positive")
        if cfg.shutdown_timeout_ms <= 0:
            raise ValueError("SHUTDOWN_TIMEOUT must be positive")
        if not cfg.kafka_brokers:
            raise ValueError("KAFKA_BROKERS must not be empty")
        if cfg.log_level not in {"debug", "info", "warn", "error"}:
            raise ValueError(f"LOG_LEVEL invalid: {cfg.log_level}")
        if cfg.log_format not in {"json", "text"}:
            raise ValueError(f"LOG_FORMAT invalid: {cfg.log_format}")
        return cfg

    @property
    def trigger(self) -> dict:
        """Streaming trigger equivalent of the flush interval."""
        return {"processingTime": f"{self.batch_flush_interval_ms} milliseconds"}

    def kafka_source_options(self) -> dict[str, str]:
        return {
            "kafka.bootstrap.servers": ",".join(self.kafka_brokers),
            "subscribe": self.kafka_source_topic,
            "startingOffsets": "earliest",
            "maxOffsetsPerTrigger": str(self.batch_size),
            "kafka.group.id": self.kafka_group_id,
            "includeHeaders": "true",
        }

    def kafka_sink_options(self) -> dict[str, str]:
        return {
            "kafka.bootstrap.servers": ",".join(self.kafka_brokers),
            "topic": self.kafka_sink_topic,
            "kafka.acks": "all",  # RequireAll (reference writer.go:23-31)
        }
