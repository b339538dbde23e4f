"""Package system — installable bundles of pipelines + contexts
(reference libtenzir/src/package.cpp:274-302 parse,
include/tenzir/package.hpp:61-196 schema): a YAML document with
``id``/``name`` metadata, typed ``inputs`` (with defaults, overridable
at install time), named ``pipelines`` (TQL definitions with
``disabled`` and ``restart-on-error`` flags), and named ``contexts``
(created on install). Definitions reference inputs as
``{{ inputs.<name> }}`` — substituted at install, exactly once.

Ray-Data-first: installing a package only COMPILES the pipelines
(``Pipeline.parse`` — cheap, driver-side validation) and registers the
contexts with the shared context actor; nothing executes until
``run()``, which streams through the normal planner path.
``restart-on-error`` maps to a bounded retry loop around the run (the
reference restarts failed packaged pipelines on a delay; a batch
engine retries the run)."""

from __future__ import annotations

import re
import time
from dataclasses import dataclass, field

from tenzir_ray.pipelines.planner import Pipeline

_INPUT_REF = re.compile(r"\{\{\s*inputs\.(\w+)\s*\}\}")

# default restart delay (defaults::packaged_pipeline_restart_on_error
# is 1 min in the reference; tests override)
_DEFAULT_RESTART_DELAY = 60.0


@dataclass
class PackageInput:
    name: str
    type: str = "string"
    description: str | None = None
    default: str | None = None


@dataclass
class PackagePipeline:
    definition: str
    name: str | None = None
    description: str | None = None
    disabled: bool = False
    unstoppable: bool = False
    restart_on_error: float | None = None  # seconds, None = off


@dataclass
class PackageContext:
    type: str = "lookup-table"
    description: str | None = None
    arguments: dict = field(default_factory=dict)
    disabled: bool = False


def _parse_restart(v) -> float | None:
    """bool or duration → retry delay seconds (package.cpp:278-312)."""
    if v is None or v is False:
        return None
    if v is True:
        return _DEFAULT_RESTART_DELAY
    if isinstance(v, (int, float)):
        if v < 0:
            raise ValueError("`restart-on-error` cannot be negative")
        return float(v)
    s = str(v).strip()
    m = re.fullmatch(r"([\d.]+)\s*(ms|s|m|min|h)?", s)
    if not m:
        if s in ("true", "yes", "on"):
            return _DEFAULT_RESTART_DELAY
        if s in ("false", "no", "off"):
            return None
        raise ValueError(f"bad `restart-on-error` value {v!r}")
    mult = {"ms": 1e-3, "s": 1.0, "m": 60.0, "min": 60.0,
            "h": 3600.0}[m.group(2) or "s"]
    return float(m.group(1)) * mult


@dataclass
class Package:
    id: str
    name: str
    author: str | None = None
    description: str | None = None
    inputs: dict[str, PackageInput] = field(default_factory=dict)
    pipelines: dict[str, PackagePipeline] = field(default_factory=dict)
    contexts: dict[str, PackageContext] = field(default_factory=dict)
    examples: list[dict] = field(default_factory=list)
    config_inputs: dict[str, str] = field(default_factory=dict)

    @classmethod
    def parse(cls, data: dict) -> "Package":
        if not data.get("id") or not data.get("name"):
            raise ValueError("package: `id` and `name` are required")
        inputs = {}
        for iname, d in (data.get("inputs") or {}).items():
            d = d or {}
            inputs[iname] = PackageInput(
                name=iname, type=str(d.get("type", "string")),
                description=d.get("description"),
                default=None if d.get("default") is None
                else str(d.get("default")))
        pipelines = {}
        for pname, d in (data.get("pipelines") or {}).items():
            d = d or {}
            if not d.get("definition"):
                raise ValueError(
                    f"package pipeline {pname!r}: `definition` required")
            pipelines[pname] = PackagePipeline(
                definition=str(d["definition"]),
                name=d.get("name"), description=d.get("description"),
                disabled=bool(d.get("disabled", False)),
                unstoppable=bool(d.get("unstoppable", False)),
                restart_on_error=_parse_restart(d.get("restart-on-error")))
        contexts = {}
        for cname, d in (data.get("contexts") or {}).items():
            d = d or {}
            contexts[cname] = PackageContext(
                type=str(d.get("type", "lookup-table")),
                description=d.get("description"),
                arguments=dict(d.get("arguments") or {}),
                disabled=bool(d.get("disabled", False)))
        cfg = (data.get("config") or {}).get("inputs") or {}
        return cls(
            id=str(data["id"]), name=str(data["name"]),
            author=data.get("author"), description=data.get("description"),
            inputs=inputs, pipelines=pipelines, contexts=contexts,
            examples=list(data.get("examples") or []),
            config_inputs={k: str(v) for k, v in cfg.items()})

    @classmethod
    def load(cls, path: str) -> "Package":
        import yaml

        with open(path) as f:
            return cls.parse(yaml.safe_load(f) or {})

    def resolve_inputs(self, overrides: dict | None = None) -> dict:
        """input name → value: override > package config > default;
        a declared input with none of the three is an install error."""
        out: dict[str, str] = {}
        overrides = overrides or {}
        for iname, inp in self.inputs.items():
            if iname in overrides:
                out[iname] = str(overrides[iname])
            elif iname in self.config_inputs:
                out[iname] = self.config_inputs[iname]
            elif inp.default is not None:
                out[iname] = inp.default
            else:
                raise ValueError(
                    f"package {self.id}: input {iname!r} has no value "
                    f"(no override, config, or default)")
        unknown = set(overrides) - set(self.inputs)
        if unknown:
            raise ValueError(
                f"package {self.id}: unknown input override(s) "
                f"{sorted(unknown)}")
        return out

    def install(self, inputs: dict | None = None,
                compile: bool = True) -> "InstalledPackage":
        """Substitute inputs, create contexts, compile enabled
        pipelines. Returns the runnable install."""
        vals = self.resolve_inputs(inputs)

        def subst(text: str) -> str:
            def rep(m: re.Match) -> str:
                k = m.group(1)
                if k not in vals:
                    raise ValueError(
                        f"package {self.id}: definition references "
                        f"undeclared input {k!r}")
                return vals[k]

            return _INPUT_REF.sub(rep, text)

        compiled: dict[str, Pipeline] = {}
        specs: dict[str, PackagePipeline] = {}
        for pname, pp in self.pipelines.items():
            if pp.disabled:
                continue
            text = subst(pp.definition)
            specs[pname] = PackagePipeline(
                definition=text, name=pp.name, description=pp.description,
                disabled=False, unstoppable=pp.unstoppable,
                restart_on_error=pp.restart_on_error)
            if compile:
                compiled[pname] = Pipeline.parse(text)
        ctxs: list[str] = []
        for cname, cc in self.contexts.items():
            if cc.disabled:
                continue
            if cc.type not in ("lookup-table", "bloom-filter", "geoip"):
                raise ValueError(
                    f"package {self.id}: unknown context type {cc.type!r}")
            if cc.type == "lookup-table":
                from tenzir_ray.state.context import ContextActor

                ContextActor(cname)  # creates (or attaches) the actor
            ctxs.append(cname)
        return InstalledPackage(package=self, inputs=vals,
                                pipeline_specs=specs, compiled=compiled,
                                context_names=ctxs)


@dataclass
class InstalledPackage:
    package: Package
    inputs: dict
    pipeline_specs: dict[str, PackagePipeline]
    compiled: dict[str, Pipeline]
    context_names: list[str]

    def run(self, name: str, ds=None, max_restarts: int = 3):
        """Run one packaged pipeline; honors its ``restart-on-error``
        delay with a bounded retry count (the reference restarts
        packaged pipelines indefinitely on a delay — a batch engine
        bounds it)."""
        spec = self.pipeline_specs[name]
        delay = spec.restart_on_error
        attempts = (max_restarts + 1) if delay is not None else 1
        last: Exception | None = None
        for i in range(attempts):
            try:
                p = self.compiled.get(name) or Pipeline.parse(
                    spec.definition)
                return p.run(ds) if ds is not None else p.run()
            except Exception as e:  # noqa: BLE001 — restart-on-error
                last = e
                if i + 1 < attempts:
                    time.sleep(delay or 0)
        assert last is not None
        raise last

    def info(self) -> dict:
        """Introspection record (reference `show packages` shape)."""
        return {
            "id": self.package.id,
            "name": self.package.name,
            "inputs": dict(self.inputs),
            "pipelines": sorted(self.pipeline_specs),
            "contexts": sorted(self.context_names),
        }
