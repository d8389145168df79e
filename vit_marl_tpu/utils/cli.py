"""Shared CLI config-override parsing for train.py / evaluate.py.

The reference drives everything through hydra overrides; the rebuild's
equivalent is repeated ``--set KEY=VALUE`` flags merged into the raw YAML
dict before ``make_config`` (ref: ippo_rnn_JAXMARL.py:840-860 hydra main).
"""

from __future__ import annotations

from typing import Dict, List

import yaml


def apply_set_overrides(raw: Dict, sets: List[str]) -> Dict:
    """Merge ``KEY=VALUE`` / ``A.B.C=VALUE`` overrides into ``raw`` in place.

    - Values parse as numbers first (plain scientific notation accepted —
      YAML 1.1 parses "1.2e8" as a *string* without the '+' sign), falling
      back to YAML scalars (true/false/strings).
    - Dotted keys reach nested sections; segments match existing YAML keys
      case-insensitively so a CLI "EXECUTION" merges into the file's
      "Execution" section instead of creating a second agent. make_config
      stays strict: unknown keys raise instead of silently doing nothing.
    """
    for kv in sets:
        key, val = kv.split("=", 1)
        try:
            num = float(val)
            parsed = int(num) if num == int(num) and "." not in val \
                and "e" not in val.lower() else num
        except ValueError:
            parsed = yaml.safe_load(val)
        parts = key.split(".")
        node = raw
        for p in parts[:-1]:
            match = next((k for k in node if k.lower() == p.lower()), None)
            if match is None or not isinstance(node[match], dict):
                match = p.upper()
                node[match] = {}
            node = node[match]
        last = next((k for k in node if k.lower() == parts[-1].lower()),
                    parts[-1].upper())
        node[last] = parsed
    return raw
