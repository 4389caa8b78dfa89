"""Deployment export subsystem (counterpart of cusrl/nn/layer/export.py:20-229 +
cusrl/template/actor_critic.py:332-418).

The reference assembles a ``FlowGraph`` of torch modules via forward pre-hooks
and exports TorchScript/ONNX.  Here the graph is a composition of *pure
functions* over a named-array context, jitted once and exported through three
backends:

* ``"stablehlo"`` — ``jax.export`` serialized StableHLO (``graph.stablehlo``),
  portable across XLA runtimes.
* ``"savedmodel"`` / ``"tflite"`` — ``jax2tf`` into a TF SavedModel / FlatBuffer
  for non-XLA deployment targets.
* ``"package"`` — the in-framework format: the pickled policy pytree +
  manifest, reloadable with :func:`load_exported_policy` (used e.g. by
  PolicyDistillation as the frozen expert).

All backends emit ``manifest.yaml`` describing IO names/shapes/dtypes, and both
stateless (memory explicit) and stateful (memory held internally —
``InferencePolicy``) call conventions are provided.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from cusrl_tpu.nn.base import Memory, reset_memory

__all__ = [
    "ExportGraph",
    "ExportedStatefulPolicy",
    "InferencePolicy",
    "InferenceWrapper",
    "export_agent",
    "load_exported_graph",
    "load_exported_policy",
]


class ExportGraph:
    """Ordered composition of named pure functions over a dict context.

    Each node reads its inputs from the context by name, writes its outputs
    back, and may expose outputs as graph results — the functional equivalent of
    the reference's pre-hook-driven FlowGraph (nn/layer/export.py:20-128).
    """

    def __init__(self, graph_name: str = "actor"):
        self.graph_name = graph_name
        self.nodes: list[tuple[str, Callable, dict[str, str], tuple[str, ...], bool, dict]] = []

    def add_node(
        self,
        name: str,
        fn: Callable[..., Any],
        inputs: dict[str, str],
        outputs: tuple[str, ...] | str,
        expose_outputs: bool = False,
        info: dict | None = None,
    ) -> None:
        if isinstance(outputs, str):
            outputs = (outputs,)
        self.nodes.append((name, fn, dict(inputs), tuple(outputs), expose_outputs, info or {}))

    def add_normalization(self, name: str, normalizer, input_name: str) -> None:
        """A (x - mean) / std node from a RunningMeanStd or (scale, shift) pair."""
        if isinstance(normalizer, tuple):
            scale, shift = (jnp.asarray(v, jnp.float32) for v in normalizer)
            fn = lambda x: (x - shift) / scale
        else:
            fn = normalizer.normalize
        self.add_node(name, fn, {"x": input_name}, (input_name,), expose_outputs=False)

    def add_denormalization(self, name: str, scale_shift: tuple, input_name: str) -> None:
        scale, shift = (jnp.asarray(v, jnp.float32) for v in scale_shift)
        self.add_node(name, lambda x: x * scale + shift, {"x": input_name}, (input_name,), expose_outputs=False)

    def add_head(self, name: str, module, input_name: str, extra_inputs: tuple[str, ...] = ()) -> None:
        """An exposed prediction head fed by a latent (plus optional extra inputs,
        concatenated — e.g. action-conditioned heads)."""

        def fn(*arrays):
            x = arrays[0] if len(arrays) == 1 else jnp.concatenate(arrays, axis=-1)
            return module(x)

        inputs = {f"arg{i}": n for i, n in enumerate((input_name, *extra_inputs))}
        self.add_node(name, fn, inputs, (name,), expose_outputs=True)

    @property
    def exposed_outputs(self) -> list[str]:
        exposed: list[str] = []
        for _, _, _, outputs, expose, _ in self.nodes:
            if expose:
                exposed.extend(o for o in outputs if o not in exposed)
        return exposed

    def build(self) -> Callable[[dict[str, Any]], dict[str, Any]]:
        """Returns context -> {exposed outputs} as one pure function."""

        def run(context: dict[str, Any]) -> dict[str, Any]:
            context = dict(context)
            for _, fn, inputs, outputs, _, _ in self.nodes:
                args = [context[src] for src in inputs.values()]
                result = fn(*args)
                if len(outputs) == 1:
                    result = (result,)
                for out_name, value in zip(outputs, result):
                    context[out_name] = value
            return {name: context[name] for name in ["action", *self.exposed_outputs] if name in context}

        return run


class InferencePolicy:
    """Stateful single/multi-instance inference wrapper (counterpart of
    cusrl/nn/module/inference.py:12-75): holds recurrent memory internally,
    preserves numpy IO, auto-adds the batch dim, supports ``reset(indices)``."""

    def __init__(self, actor, num_instances: int = 1, deterministic: bool = True):
        self.actor = actor
        self.num_instances = num_instances
        self.deterministic = deterministic
        self.memory: Memory = actor.init_memory(num_instances) if actor.is_recurrent else None
        self._act = jax.jit(lambda a, obs, mem: a.act_deterministic(obs, mem))

    def __call__(self, observation):
        was_numpy = isinstance(observation, np.ndarray)
        observation = jnp.asarray(observation, jnp.float32)
        squeeze = observation.ndim == 1
        if squeeze:
            observation = observation[None]
        action, self.memory = self._act(self.actor, observation, self.memory)
        if squeeze:
            action = action[0]
        return np.asarray(action) if was_numpy else action

    def reset(self, indices=None) -> None:
        if self.memory is None:
            return
        if indices is None:
            self.memory = self.actor.init_memory(self.num_instances)
        else:
            done = np.zeros((self.num_instances, 1), bool)
            done[np.asarray(indices)] = True
            self.memory = reset_memory(self.memory, jnp.asarray(done))


def _manifest(inputs: dict[str, Any], outputs: dict[str, Any], extra: dict) -> str:
    import yaml

    from cusrl_tpu.utils.nest import flatten_nested

    def describe(tree):
        return {
            name: {"shape": [int(s) for s in leaf.shape], "dtype": str(leaf.dtype)}
            for name, leaf in flatten_nested(tree).items()
        }

    return yaml.safe_dump({"inputs": describe(inputs), "outputs": describe(outputs), **extra}, sort_keys=False)


def _force_fp32_compute(obj):
    """Recursively rewrites ``compute_dtype`` static fields to None so exported
    deployment graphs run pure float32 (edge/CPU targets; TFLite cannot
    legalize bfloat16 matmuls)."""
    import dataclasses

    from cusrl_tpu.nn.base import Module

    if isinstance(obj, Module):
        changes = {f.name: _force_fp32_compute(getattr(obj, f.name)) for f in dataclasses.fields(obj)}
        if "compute_dtype" in changes:
            changes["compute_dtype"] = None
        return dataclasses.replace(obj, **changes)
    if isinstance(obj, tuple):
        return tuple(_force_fp32_compute(v) for v in obj)
    if isinstance(obj, list):
        return [_force_fp32_compute(v) for v in obj]
    return obj


def build_actor_graph(agent, with_environment_normalization: bool = True) -> ExportGraph:
    """Observation normalization -> hook pre_export nodes -> deterministic actor
    -> hook post_export heads -> action denormalization (actor_critic.py:332-418)."""
    graph = ExportGraph("actor")
    spec = agent.environment_spec
    if with_environment_normalization and spec.observation_normalization is not None:
        scale, shift = spec.observation_normalization
        graph.add_node(
            "observation_normalization",
            lambda x, s=jnp.asarray(scale, jnp.float32), t=jnp.asarray(shift, jnp.float32): (x - t) / s,
            {"x": "observation"},
            ("observation",),
        )
    for hook in agent.state.hooks:
        hook.pre_export(agent, graph)

    actor = agent.state.actor
    info = {"observation_dim": spec.observation_dim, "action_dim": spec.action_dim, "is_recurrent": actor.is_recurrent}
    if actor.is_recurrent:

        def actor_fn(observation, memory):
            dist_params, new_memory, aux = actor(observation, memory)
            return actor.distribution.mode(dist_params), aux["backbone.output"], new_memory

        graph.add_node(
            "actor",
            actor_fn,
            {"observation": "observation", "memory": "memory_in"},
            ("action", "actor.backbone.output", "memory_out"),
            expose_outputs=True,
            info=info,
        )
    else:

        def actor_fn(observation):
            dist_params, _, aux = actor(observation, None)
            return actor.distribution.mode(dist_params), aux["backbone.output"]

        graph.add_node(
            "actor",
            actor_fn,
            {"observation": "observation"},
            ("action", "actor.backbone.output"),
            expose_outputs=True,
            info=info,
        )
    for hook in agent.state.hooks:
        hook.post_export(agent, graph)
    if with_environment_normalization and spec.action_denormalization is not None:
        graph.add_denormalization("action_denormalization", spec.action_denormalization, "action")
    return graph


def export_agent(
    agent,
    output_dir: str,
    *,
    target_format: str = "stablehlo",
    with_environment_normalization: bool = True,
    batch_size: int = 1,
    verbose: bool = True,
    **kwargs,
) -> None:
    os.makedirs(output_dir, exist_ok=True)
    if target_format == "onnx":
        # Reference capability (torch.onnx.export + checker/optimizer,
        # cusrl/nn/layer/export.py:173-229).  TPU-native route: jax2tf
        # SavedModel -> tf2onnx.  Guarded up front so environments without
        # tf2onnx fail fast with the sanctioned substitutes named (SURVEY
        # §2.7 maps ONNX to StableHLO/SavedModel/TFLite).
        try:
            import tf2onnx  # noqa: F401
        except ImportError as error:
            raise ImportError(
                "onnx export requires the 'tf2onnx' package; the first-class "
                "deployment formats are 'stablehlo', 'savedmodel', and 'tflite'"
            ) from error
    if target_format in ("savedmodel", "tflite", "onnx"):
        # Deployment targets run pure fp32 (TFLite cannot legalize bf16 matmuls).
        class _ActorOverride:
            def __init__(self, inner, actor):
                self._inner = inner
                self.state = inner.state.replace(actor=actor)
                self.environment_spec = inner.environment_spec

            def __getattr__(self, name):
                return getattr(self._inner, name)

        agent = _ActorOverride(agent, _force_fp32_compute(agent.state.actor))
    graph = build_actor_graph(agent, with_environment_normalization)
    run = graph.build()
    actor = agent.state.actor
    spec = agent.environment_spec

    example: dict[str, Any] = {"observation": jnp.zeros((batch_size, spec.observation_dim), jnp.float32)}
    if actor.is_recurrent:
        example["memory_in"] = actor.init_memory(batch_size)

    stateless = lambda context: run(context)
    outputs = jax.eval_shape(stateless, example)
    manifest = _manifest(
        jax.eval_shape(lambda x: x, example),
        outputs,
        {"graph": graph.graph_name, "format": target_format, "is_recurrent": actor.is_recurrent},
    )
    with open(os.path.join(output_dir, "manifest.yaml"), "w") as f:
        f.write(manifest)

    if target_format == "stablehlo":
        # Multi-platform lowering: the artifact must execute on deployment
        # hosts (cpu) as well as the training platform, not be locked to
        # whichever backend happened to be active at export time.
        platforms = kwargs.get("platforms", ("cpu", "tpu"))
        exported = jax.export.export(jax.jit(stateless), platforms=tuple(platforms))(example)
        with open(os.path.join(output_dir, "graph.stablehlo"), "wb") as f:
            f.write(exported.serialize())
        if actor.is_recurrent:
            # Persist the stateful artifact alongside the functional graph: the
            # initial memory buffers let ExportedStatefulPolicy reconstruct the
            # reference's stateful deployable (memory held as buffers + a
            # reset(indices) entry point — cusrl/nn/layer/export.py:298-393).
            with open(os.path.join(output_dir, "initial_memory.pkl"), "wb") as f:
                pickle.dump(jax.tree.map(np.asarray, actor.init_memory(batch_size)), f)
    elif target_format in ("savedmodel", "tflite", "onnx"):
        import tensorflow as tf
        from jax.experimental import jax2tf

        tf_fn = tf.function(
            jax2tf.convert(stateless, with_gradient=False),
            autograph=False,
            input_signature=[
                jax.tree.map(lambda x: tf.TensorSpec(np.shape(x), str(np.asarray(x).dtype)), example)
            ],
        )
        module = tf.Module()
        module.f = tf_fn
        saved_dir = os.path.join(output_dir, "saved_model")
        tf.saved_model.save(module, saved_dir)
        if target_format == "tflite":
            converter = tf.lite.TFLiteConverter.from_saved_model(saved_dir)
            converter.target_spec.supported_ops = [
                tf.lite.OpsSet.TFLITE_BUILTINS,
                tf.lite.OpsSet.SELECT_TF_OPS,
            ]
            with open(os.path.join(output_dir, "graph.tflite"), "wb") as f:
                f.write(converter.convert())
        elif target_format == "onnx":
            import tf2onnx

            model_proto, _ = tf2onnx.convert.from_saved_model(
                saved_dir, output_path=os.path.join(output_dir, "graph.onnx")
            )
            try:
                import onnx

                onnx.checker.check_model(os.path.join(output_dir, "graph.onnx"))
            except ImportError:
                pass  # checker optional, mirroring the reference's best-effort chain
    elif target_format == "package":
        payload = {
            "actor": jax.tree.map(lambda x: np.asarray(x), actor),
            "observation_dim": spec.observation_dim,
            "action_dim": spec.action_dim,
        }
        with open(os.path.join(output_dir, "policy.pkl"), "wb") as f:
            pickle.dump(payload, f)
    else:
        raise ValueError(f"Unsupported export format '{target_format}'")
    if verbose:
        print(f"Agent exported to {output_dir} in '{target_format}' format.")


def load_exported_policy(path: str):
    """Loads a ``package``-format export back into an actor Module pytree."""
    if os.path.isdir(path):
        path = os.path.join(path, "policy.pkl")
    with open(path, "rb") as f:
        payload = pickle.load(f)
    return jax.tree.map(jnp.asarray, payload["actor"])


def load_exported_graph(path: str):
    """Deserializes a ``stablehlo``-format export directory back into an
    executable callable ``context -> outputs`` plus its parsed manifest —
    the deployment-side counterpart of the reference's TorchScript reload
    (cusrl/nn/layer/export.py:130-229)."""
    import yaml

    with open(os.path.join(path, "graph.stablehlo"), "rb") as f:
        exported = jax.export.deserialize(bytearray(f.read()))
    with open(os.path.join(path, "manifest.yaml")) as f:
        manifest = yaml.safe_load(f)
    return exported.call, manifest


class ExportedStatefulPolicy:
    """Stateful deployable reconstructed from a persisted ``stablehlo`` export
    of a recurrent actor: the functional graph plus the persisted
    ``initial_memory.pkl`` buffers give the reference's stateful artifact
    semantics — memory held internally, numpy IO, ``reset(indices)``
    (cusrl/nn/layer/export.py:298-393)."""

    def __init__(self, path: str):
        self.call, self.manifest = load_exported_graph(path)
        if not self.manifest.get("is_recurrent"):
            raise ValueError(f"'{path}' is a stateless export; use load_exported_graph")
        with open(os.path.join(path, "initial_memory.pkl"), "rb") as f:
            self._initial_memory = jax.tree.map(jnp.asarray, pickle.load(f))
        self.memory = self._initial_memory
        self.num_instances = int(self.manifest["inputs"]["observation"]["shape"][0])

    def __call__(self, observation):
        was_numpy = isinstance(observation, np.ndarray)
        observation = jnp.asarray(observation, jnp.float32)
        squeeze = observation.ndim == 1
        if squeeze:
            observation = observation[None]
        outputs = self.call({"observation": observation, "memory_in": self.memory})
        self.memory = outputs.pop("memory_out")
        action = outputs["action"]
        if squeeze:
            action = action[0]
        return np.asarray(action) if was_numpy else action

    def reset(self, indices=None) -> None:
        if indices is None:
            self.memory = self._initial_memory
            return
        done = np.zeros((self.num_instances,), bool)
        done[np.asarray(indices)] = True
        mask = jnp.asarray(done)
        self.memory = jax.tree.map(
            lambda init, mem: jnp.where(jnp.reshape(mask, mask.shape[:1] + (1,) * (mem.ndim - 1)), init, mem),
            self._initial_memory,
            self.memory,
        )


# Reference-compatible alias (cusrl/nn/module/inference.py InferenceWrapper).
InferenceWrapper = InferencePolicy
