"""Config-driven ingest: the YAML shape of the reference's data config.

The reference loads a YAML mapping config keyed by (mapping_type, bank)
and dispatches each discovered CSV to its per-group transform
(reference: config/settings.py:23-31, utils/data_manager.py:105-141).
Here the config is parsed once on the driver into typed dataclasses;
all per-row work happens in Spark expressions generated from it.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import yaml


@dataclass(frozen=True)
class FileGroupConfig:
    """Transform config for one (mapping_type, bank) file group
    (key vocabulary: reference utils/data_manager.py:38,49,62,71,72,76,90)."""

    mapping_type: str  # 'stm' | 'sec'
    bank: str
    csv_separator: str
    date_format: str  # Python strftime (translated for Spark)
    original_fields: dict[str, str]  # source header -> canonical name
    surrogate_key_columns: list[str]
    desired_fields: list[str]
    accounts: dict[str, str] = field(default_factory=dict)
    debit_multiplier: dict[str, int] = field(default_factory=dict)


@dataclass(frozen=True)
class IngestConfig:
    file_pattern: str  # regex w/ exactly 3 groups: (bank, acc_type, mapping_type)
    groups: tuple[FileGroupConfig, ...]

    def group(self, mapping_type: str, bank: str) -> FileGroupConfig | None:
        """Config dispatch (reference utils/data_manager.py:161-170):
        missing (mapping_type, bank) -> None -> file group skipped."""
        for g in self.groups:
            if g.mapping_type == mapping_type and g.bank == bank:
                return g
        return None


def load_config(path: str) -> IngestConfig:
    with open(path) as f:
        raw = yaml.safe_load(f)
    groups = []
    for mapping_type, banks in raw["mapping"].items():
        for bank, cfg in banks.items():
            groups.append(
                FileGroupConfig(
                    mapping_type=mapping_type,
                    bank=bank,
                    csv_separator=cfg["csv_separator"],
                    date_format=cfg["date_format"],
                    original_fields=dict(cfg["original_fields"]),
                    surrogate_key_columns=list(cfg["surrogate_key_columns"]),
                    desired_fields=list(cfg["desired_fields"]),
                    accounts=dict(cfg.get("accounts") or {}),
                    debit_multiplier=dict(cfg.get("debit_multiplier") or {}),
                )
            )
    return IngestConfig(file_pattern=raw["file_pattern"], groups=tuple(groups))
