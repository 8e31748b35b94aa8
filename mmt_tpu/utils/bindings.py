"""Gin-style binding files/params without the gin dependency.

Parity surface: the reference accepts arbitrary ``--gin_file`` /
``--gin_params`` bindings (``src/train.py:39-48``,
``gin.parse_config_files_and_bindings``) although the only in-tree use
is injecting ``encoder_cls`` into ``build_encoder``
(``src/configs/encoders.py:112-158``).  This module re-provides the
binding mechanism generically:

* ``target.attr = value`` lines (one per line; ``#`` comments and blank
  lines ignored).  Values are Python literals (``ast.literal_eval``:
  numbers, strings, bools, None, lists/tuples/dicts) or ``@dotted.path``
  references, which resolve by import to the named object -- gin's
  ``@`` syntax for classes/functions.
* The target resolves as the longest importable module prefix followed
  by a getattr chain; the final attribute is assigned (module constants,
  dataclass class defaults, registry entries).
* When no module prefix imports, the binding addresses a
  ``@configurable`` function's keyword default -- e.g. the reference's
  own gin idiom ``build_encoder.encoder_cls = @my.Encoder`` binds the
  ``encoder_cls`` parameter of the registered ``build_encoder``.

The framework's primary config surface remains yaml/params_override
(typed + strictly validated); bindings exist for the reference's
escape-hatch use case: injecting code objects the config schema does
not model.
"""

from __future__ import annotations

import ast
import functools
import importlib
import inspect
from typing import Any, Dict, Iterable, List, Sequence, Tuple

# "function_name.param" -> bound value, consumed by @configurable.
_OVERRIDES: Dict[str, Any] = {}
# registered configurable name -> set of parameter names (validation).
_CONFIGURABLES: Dict[str, set] = {}


def configurable(fn=None, *, name: str = None):
    """Marks a function's keyword defaults as bindable (gin analog).

    A binding ``<name>.<param> = value`` replaces the default of
    ``param`` for calls that do not pass it explicitly.
    """
    if fn is None:
        return lambda f: configurable(f, name=name)
    reg_name = name or fn.__name__
    params = set(inspect.signature(fn).parameters)
    _CONFIGURABLES[reg_name] = params

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        bound = inspect.signature(fn).bind_partial(*args, **kwargs)
        for p in params:
            key = f"{reg_name}.{p}"
            if p not in bound.arguments and key in _OVERRIDES:
                kwargs[p] = _OVERRIDES[key]
        return fn(*args, **kwargs)

    wrapper._configurable_name = reg_name
    return wrapper


def resolve_reference(path: str) -> Any:
    """``@pkg.mod.Obj`` -> the imported object (gin's ``@`` syntax)."""
    path = path.lstrip("@").replace(":", ".")
    parts = path.split(".")
    for cut in range(len(parts) - 1, 0, -1):
        try:
            obj = importlib.import_module(".".join(parts[:cut]))
        except ImportError:
            continue
        for attr in parts[cut:]:
            obj = getattr(obj, attr)
        return obj
    raise ImportError(f"cannot resolve reference {path!r}")


def _parse_value(text: str) -> Any:
    text = text.strip()
    if text.startswith("@"):
        return resolve_reference(text)
    try:
        return ast.literal_eval(text)
    except (ValueError, SyntaxError):
        raise ValueError(
            f"unparseable binding value {text!r} (expected a Python "
            "literal or an @dotted.reference)"
        )


def parse_bindings(lines: Iterable[str]) -> List[Tuple[str, Any]]:
    out = []
    for raw in lines:
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        if "=" not in line:
            raise ValueError(f"binding line without '=': {raw!r}")
        key, value = line.split("=", 1)
        key = key.strip()
        if not key or "." not in key:
            raise ValueError(
                f"binding target must be 'scope.attr', got {key!r}")
        out.append((key, _parse_value(value)))
    return out


def _bind_one(key: str, value: Any) -> None:
    parts = key.split(".")
    # 1) module-attribute target: longest importable prefix + getattrs.
    for cut in range(len(parts) - 1, 0, -1):
        try:
            obj = importlib.import_module(".".join(parts[:cut]))
        except ImportError:
            continue
        for attr in parts[cut:-1]:
            obj = getattr(obj, attr)
        if not hasattr(obj, parts[-1]):
            raise AttributeError(
                f"binding target {key!r}: {obj!r} has no attribute "
                f"{parts[-1]!r}")
        setattr(obj, parts[-1], value)
        return
    # 2) configurable-function parameter.
    name, param = ".".join(parts[:-1]), parts[-1]
    if name in _CONFIGURABLES:
        if param not in _CONFIGURABLES[name]:
            raise ValueError(
                f"{name!r} has no parameter {param!r} "
                f"(has: {sorted(_CONFIGURABLES[name])})")
        _OVERRIDES[f"{name}.{param}"] = value
        return
    raise ValueError(
        f"unknown binding target {key!r}: not an importable module "
        f"attribute and not a registered configurable "
        f"(registered: {sorted(_CONFIGURABLES)})")


def apply_bindings(files: Sequence[str] = (),
                   params: Sequence[str] = ()) -> int:
    """Applies gin-style bindings from files then inline params
    (later bindings win, matching gin).  Returns the binding count."""
    bindings: List[Tuple[str, Any]] = []
    for path in files or ():
        with open(path) as f:
            bindings.extend(parse_bindings(f))
    bindings.extend(parse_bindings(params or ()))
    for key, value in bindings:
        _bind_one(key, value)
    return len(bindings)


def clear_bindings() -> None:
    """Resets configurable-parameter overrides (tests)."""
    _OVERRIDES.clear()
