"""Minimal Hydra-compatible config system.

The reference uses Hydra 1.3 + OmegaConf (reference: src/main.py:18, config/trainer.yaml:1-8).
Neither is available here, so this module reimplements the subset the config surface needs:

  * a root YAML with a ``defaults`` list composing group files (``env: atari``,
    ``agent: default``) into sub-keys,
  * absolute interpolation ``${a.b.c}``,
  * relative interpolation ``${.sibling}`` / ``${..parent_sibling}``,
  * an ``${eval:'...'}`` resolver (reference registers the same, src/main.py:15),
  * dotted CLI overrides ``a.b.c=value`` (values parsed as YAML).

Config keys are kept identical to the reference (config/trainer.yaml, config/agent/default.yaml,
config/env/atari.yaml) so experiments translate 1:1.
"""

from __future__ import annotations

import copy
import re
from pathlib import Path
from typing import Any, Dict, List, Optional

import yaml

_INTERP_RE = re.compile(r"\$\{([^${}]+)\}")


class Cfg(dict):
    """Dict with attribute access and dotted-path get/set."""

    def __getattr__(self, k: str) -> Any:
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k: str, v: Any) -> None:
        self[k] = v

    def get_path(self, path: str) -> Any:
        node: Any = self
        for part in path.split("."):
            if isinstance(node, list):
                node = node[int(part)]
            else:
                node = node[part]
        return node

    def set_path(self, path: str, value: Any) -> None:
        parts = path.split(".")
        node: Any = self
        for part in parts[:-1]:
            if part not in node or not isinstance(node[part], (dict, list)):
                node[part] = Cfg()
            node = node[part]
        node[parts[-1]] = value

    def to_dict(self) -> Dict[str, Any]:
        def conv(x: Any) -> Any:
            if isinstance(x, dict):
                return {k: conv(v) for k, v in x.items()}
            if isinstance(x, list):
                return [conv(v) for v in x]
            return x

        return conv(self)


_SCI_FLOAT_RE = re.compile(r"^[+-]?(\d+(\.\d*)?|\.\d+)[eE][+-]?\d+$")


def _to_cfg(x: Any) -> Any:
    if isinstance(x, dict):
        return Cfg({k: _to_cfg(v) for k, v in x.items()})
    if isinstance(x, list):
        return [_to_cfg(v) for v in x]
    if isinstance(x, str) and _SCI_FLOAT_RE.match(x):
        # PyYAML (YAML 1.1) leaves exponent-only floats like 1e-4 as strings; Hydra parses
        # them as floats — match Hydra.
        return float(x)
    return x


def _parse_value(s: str) -> Any:
    try:
        return yaml.safe_load(s)
    except yaml.YAMLError:
        return s


def _resolve_ref(root: Cfg, ctx_path: List[str], ref: str) -> Any:
    """Resolve an interpolation reference, possibly relative (leading dots)."""
    if ref.startswith("eval:"):
        expr = ref[len("eval:"):].strip()
        if (expr.startswith("'") and expr.endswith("'")) or (
            expr.startswith('"') and expr.endswith('"')
        ):
            expr = expr[1:-1]
        return eval(expr, {"__builtins__": {"float": float, "int": int, "min": min, "max": max}})
    n_dots = 0
    while n_dots < len(ref) and ref[n_dots] == ".":
        n_dots += 1
    rest = ref[n_dots:]
    if n_dots == 0:
        base: List[str] = []
    else:
        # OmegaConf: one dot = current node, each extra dot = one level up.
        base = ctx_path[: len(ctx_path) - (n_dots - 1)]
    path = ".".join(base + ([rest] if rest else []))
    return root.get_path(path)


def _resolve_node(root: Cfg, node: Any, path: List[str], depth: int = 0) -> Any:
    if depth > 20:
        raise ValueError(f"Interpolation too deep at {'.'.join(path)}")
    if isinstance(node, dict):
        for k in list(node.keys()):
            node[k] = _resolve_node(root, node[k], path + [k], depth)
        return node
    if isinstance(node, list):
        return [_resolve_node(root, v, path + [str(i)], depth) for i, v in enumerate(node)]
    if isinstance(node, str):
        return _resolve_str(root, node, path, depth)
    return node


def _resolve_str(root: Cfg, s: str, path: List[str], depth: int) -> Any:
    m = _INTERP_RE.fullmatch(s.strip())
    if m and s.strip() == s:
        # Whole-string interpolation: preserve type.
        val = _resolve_ref(root, path[:-1], m.group(1))
        if isinstance(val, str):
            return _resolve_str(root, val, path, depth + 1)
        return _resolve_node(root, val, path, depth + 1) if isinstance(val, (dict, list)) else val

    def repl(match: "re.Match[str]") -> str:
        val = _resolve_ref(root, path[:-1], match.group(1))
        if isinstance(val, str):
            val = _resolve_str(root, val, path, depth + 1)
        return str(val)

    prev = None
    while prev != s and _INTERP_RE.search(s):
        prev = s
        m = _INTERP_RE.fullmatch(s)
        if m:
            # Nested interpolations reduced to a single one: resolve with type preserved.
            val = _resolve_ref(root, path[:-1], m.group(1))
            if isinstance(val, str):
                return _resolve_str(root, val, path, depth + 1)
            return val
        s = _INTERP_RE.sub(repl, s)
    return s


def _merge(dst: Cfg, src: Cfg) -> Cfg:
    for k, v in src.items():
        if k in dst and isinstance(dst[k], dict) and isinstance(v, dict):
            _merge(dst[k], v)
        else:
            dst[k] = copy.deepcopy(v)
    return dst


DEFAULT_CONFIG_DIR = Path(__file__).parent / "configs"


def load_config(
    config_name: str = "trainer",
    overrides: Optional[List[str]] = None,
    config_dir: Optional[Path] = None,
    resolve: bool = True,
) -> Cfg:
    """Compose the config tree the way Hydra does for the reference (config/trainer.yaml:1-4)."""
    config_dir = Path(config_dir) if config_dir is not None else DEFAULT_CONFIG_DIR
    root_raw = yaml.safe_load((config_dir / f"{config_name}.yaml").read_text()) or {}
    defaults = root_raw.pop("defaults", [])
    root_raw.pop("hydra", None)

    # Hydra-style group swaps: an override like `env=fake` replaces the group selection.
    group_names = {g for item in defaults if isinstance(item, dict) for g in item}
    overrides = list(overrides or [])
    value_overrides = []
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"Override must be key=value, got {ov!r}")
        key, _, raw = ov.partition("=")
        key = key.strip()
        if key in group_names:
            if not (config_dir / key / f"{raw.strip()}.yaml").is_file():
                options = sorted(p.stem for p in (config_dir / key).glob("*.yaml"))
                raise ValueError(f"Unknown {key} group option {raw.strip()!r}; "
                                 f"available: {options}")
            defaults = [
                {key: raw.strip()} if isinstance(item, dict) and key in item else item
                for item in defaults
            ]
        else:
            value_overrides.append((key, raw.strip()))

    cfg = Cfg()
    for item in defaults:
        if item == "_self_":
            _merge(cfg, _to_cfg(root_raw))
        elif isinstance(item, dict):
            for group, name in item.items():
                group_cfg = yaml.safe_load((config_dir / group / f"{name}.yaml").read_text()) or {}
                _merge(cfg, Cfg({group: _to_cfg(group_cfg)}))
        else:
            raise ValueError(f"Unsupported defaults entry: {item}")
    if "_self_" not in defaults:
        _merge(cfg, _to_cfg(root_raw))

    for key, raw in value_overrides:
        # Hydra-style strictness: a plain override must target an existing key (silent
        # typo-created keys are a classic footgun); prefix with '+' to add a new key.
        add_new = key.startswith("+")
        key = key.lstrip("+")
        if not add_new:
            try:
                cfg.get_path(key)
            except (KeyError, IndexError, TypeError):
                raise KeyError(
                    f"Override targets unknown config key {key!r} (use +{key}=... to add "
                    "a new key)") from None
        cfg.set_path(key, _to_cfg(_parse_value(raw)))

    if resolve:
        _resolve_node(cfg, cfg, [])
    return cfg


def save_config(cfg: Cfg, path: Path) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(yaml.safe_dump(cfg.to_dict(), sort_keys=False))
