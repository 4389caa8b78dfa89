"""Export subsystem tests (counterpart of cusrl_test/integration/test_agent_export.py)."""

import os

import numpy as np
import pytest

import cusrl_tpu
from cusrl_tpu.export import InferencePolicy, load_exported_policy
from tests.helpers import create_dummy_env, run_training


pytestmark = pytest.mark.slow

def make_agent(env, recurrent=False, **kwargs):
    if recurrent:
        factory = cusrl_tpu.RecurrentPpoAgentFactory(
            num_steps_per_update=8, rnn_hidden_size=16, mlp_hidden_dims=(16,),
            sampler_epochs=1, sampler_mini_batches=1, **kwargs)
    else:
        factory = cusrl_tpu.PpoAgentFactory(
            num_steps_per_update=8, actor_hidden_dims=(16,), critic_hidden_dims=(16,),
            sampler_epochs=1, sampler_mini_batches=1, **kwargs)
    return factory(env.spec)


def test_export_stablehlo_plain(tmp_path):
    env = create_dummy_env()
    agent = make_agent(env)
    agent.export(str(tmp_path), target_format="stablehlo")
    assert (tmp_path / "graph.stablehlo").exists()
    assert (tmp_path / "manifest.yaml").exists()
    import yaml

    manifest = yaml.safe_load((tmp_path / "manifest.yaml").read_text())
    assert manifest["inputs"]["observation"]["shape"] == [1, env.spec.observation_dim]
    assert manifest["outputs"]["action"]["shape"] == [1, env.spec.action_dim]


def test_export_stablehlo_recurrent_with_norm(tmp_path):
    env = create_dummy_env()
    agent = make_agent(env, recurrent=True, normalize_observation=True)
    run_training(agent, env, num_updates=1)
    agent.export(str(tmp_path), target_format="stablehlo")
    import yaml

    manifest = yaml.safe_load((tmp_path / "manifest.yaml").read_text())
    assert manifest["is_recurrent"] is True


def test_export_package_roundtrip(tmp_path):
    env = create_dummy_env()
    agent = make_agent(env)
    run_training(agent, env, num_updates=1)
    agent.export(str(tmp_path), target_format="package", verbose=False)
    actor = load_exported_policy(str(tmp_path))

    import jax.numpy as jnp

    obs = jnp.asarray(np.random.default_rng(0).standard_normal((3, env.spec.observation_dim)), jnp.float32)
    a1, _ = agent.state.actor.act_deterministic(obs)
    a2, _ = actor.act_deterministic(obs)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-6)


def test_inference_policy_wrapper():
    env = create_dummy_env()
    agent = make_agent(env, recurrent=True)
    policy = InferencePolicy(agent.state.actor, num_instances=2)
    obs = np.zeros((2, env.spec.observation_dim), np.float32)
    action = policy(obs)
    assert isinstance(action, np.ndarray) and action.shape == (2, env.spec.action_dim)
    policy.reset([0])
    single = policy(np.zeros(env.spec.observation_dim, np.float32))
    assert single.shape[-1] == env.spec.action_dim


def test_export_stablehlo_roundtrip_executes(tmp_path):
    """Deserialize the serialized StableHLO artifact and execute it; outputs
    must match the in-process actor exactly (the reference's export checker,
    cusrl/nn/layer/export.py:130-229)."""
    from cusrl_tpu.export import load_exported_graph

    env = create_dummy_env()
    agent = make_agent(env, normalize_observation=True)
    run_training(agent, env, num_updates=1)
    agent.export(str(tmp_path), target_format="stablehlo", batch_size=3, verbose=False)

    call, manifest = load_exported_graph(str(tmp_path))
    import jax.numpy as jnp

    obs = jnp.asarray(np.random.default_rng(0).standard_normal((3, env.spec.observation_dim)), jnp.float32)
    outputs = call({"observation": obs})
    assert manifest["is_recurrent"] is False

    # In-process reference: the same graph, run directly.
    from cusrl_tpu.export import build_actor_graph

    expected = build_actor_graph(agent).build()({"observation": obs})
    np.testing.assert_allclose(np.asarray(outputs["action"]), np.asarray(expected["action"]), atol=1e-6)


def test_export_stateful_artifact_roundtrip(tmp_path):
    """The persisted recurrent export must reload as a stateful policy whose
    step-by-step trajectory matches the in-process InferencePolicy, including
    partial reset(indices) (cusrl/nn/layer/export.py:298-393)."""
    from cusrl_tpu.export import ExportedStatefulPolicy

    env = create_dummy_env()
    agent = make_agent(env, recurrent=True)
    run_training(agent, env, num_updates=1)
    agent.export(str(tmp_path), target_format="stablehlo", batch_size=2, verbose=False)
    assert (tmp_path / "initial_memory.pkl").exists()

    loaded = ExportedStatefulPolicy(str(tmp_path))
    reference = InferencePolicy(agent.state.actor, num_instances=2)

    rng = np.random.default_rng(1)
    for step in range(4):
        obs = rng.standard_normal((2, env.spec.observation_dim)).astype(np.float32)
        np.testing.assert_allclose(loaded(obs), reference(obs), atol=1e-5)
        if step == 1:  # partial reset must track the reference wrapper
            loaded.reset([0])
            reference.reset([0])
    loaded.reset()
    reference.reset()
    obs = rng.standard_normal((2, env.spec.observation_dim)).astype(np.float32)
    np.testing.assert_allclose(loaded(obs), reference(obs), atol=1e-5)


def test_export_tflite_roundtrip_subprocess(tmp_path):
    """savedmodel/tflite backends must EXECUTE, not just serialize.  TensorFlow
    cannot be imported beside jax+torch in this process (segfault), so both the
    export and the tflite execution run in clean subprocesses."""
    import json
    import subprocess
    import sys

    env = create_dummy_env()
    agent = make_agent(env)
    run_training(agent, env, num_updates=1)
    # Reference outputs + weights from this process (no TF here).  The TF
    # backends force fp32 compute, so compare against the fp32 view.
    from cusrl_tpu.export import _force_fp32_compute

    agent.export(str(tmp_path / "pkg"), target_format="package", verbose=False)
    obs = np.random.default_rng(0).standard_normal((1, env.spec.observation_dim)).astype(np.float32)
    expected, _ = _force_fp32_compute(agent.state.actor).act_deterministic(obs)
    np.save(tmp_path / "obs.npy", obs)

    script = f"""
import json, os, sys
import numpy as np
sys.path.insert(0, {str(os.getcwd())!r})
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from cusrl_tpu.export import export_agent, load_exported_policy

class _Shim:
    pass

import cusrl_tpu
from cusrl_tpu.testing.environment import DummyEnvironment
actor = load_exported_policy({str(tmp_path / 'pkg')!r})

# Rebuild a minimal agent-like object for export_agent.
class _State:
    hooks = ()
    def replace(self, **kw):
        import copy
        s = copy.copy(self)
        for k, v in kw.items():
            setattr(s, k, v)
        return s

class AgentShim:
    class _Spec:
        observation_dim = {env.spec.observation_dim}
        action_dim = {env.spec.action_dim}
        observation_normalization = None
        action_denormalization = None
    environment_spec = _Spec()
    state = _State()
    state.actor = actor

export_agent(AgentShim(), {str(tmp_path / 'tfl')!r}, target_format="tflite", verbose=False)

import tensorflow as tf
interp = tf.lite.Interpreter(model_path={str(tmp_path / 'tfl' / 'graph.tflite')!r})
runner = interp.get_signature_runner() if interp.get_signature_list() else None
obs = np.load({str(tmp_path / 'obs.npy')!r})
if runner is not None:
    names = list(runner.get_input_details())
    out = runner(**{{names[0]: obs}})
    action = list(out.values())[0]
else:
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    interp.set_tensor(inp["index"], obs)
    interp.invoke()
    action = interp.get_tensor(interp.get_output_details()[0]["index"])
print("TFLITE_RESULT " + json.dumps(np.asarray(action).reshape(-1).tolist()))
"""
    result = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, timeout=600, cwd=os.getcwd()
    )
    if result.returncode != 0 and ("No module named 'tensorflow'" in result.stderr or "stub" in result.stderr):
        pytest.skip("real TensorFlow unavailable")
    assert result.returncode == 0, result.stderr[-2000:]
    line = [l for l in result.stdout.splitlines() if l.startswith("TFLITE_RESULT ")][-1]
    action = np.asarray(json.loads(line[len("TFLITE_RESULT "):]), np.float32)
    np.testing.assert_allclose(action, np.asarray(expected).reshape(-1), atol=1e-4)


def test_export_savedmodel_roundtrip_subprocess(tmp_path):
    """The SavedModel backend must load and execute (TF subprocess), matching
    the fp32 actor."""
    import json
    import subprocess
    import sys

    env = create_dummy_env()
    agent = make_agent(env)
    run_training(agent, env, num_updates=1)
    from cusrl_tpu.export import _force_fp32_compute

    agent.export(str(tmp_path / "pkg"), target_format="package", verbose=False)
    obs = np.random.default_rng(1).standard_normal((1, env.spec.observation_dim)).astype(np.float32)
    expected, _ = _force_fp32_compute(agent.state.actor).act_deterministic(obs)
    np.save(tmp_path / "obs.npy", obs)

    script = f"""
import json, os, sys
import numpy as np
sys.path.insert(0, {str(os.getcwd())!r})
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from cusrl_tpu.export import export_agent, load_exported_policy

class _State:
    hooks = ()
    def replace(self, **kw):
        import copy
        s = copy.copy(self)
        for k, v in kw.items():
            setattr(s, k, v)
        return s

class AgentShim:
    class _Spec:
        observation_dim = {env.spec.observation_dim}
        action_dim = {env.spec.action_dim}
        observation_normalization = None
        action_denormalization = None
    environment_spec = _Spec()
    state = _State()
    state.actor = load_exported_policy({str(tmp_path / 'pkg')!r})

export_agent(AgentShim(), {str(tmp_path / 'sm')!r}, target_format="savedmodel", verbose=False)

import tensorflow as tf
module = tf.saved_model.load({str(tmp_path / 'sm' / 'saved_model')!r})
obs = np.load({str(tmp_path / 'obs.npy')!r})
out = module.f({{"observation": tf.constant(obs)}})
action = out["action"].numpy()
print("SM_RESULT " + json.dumps(np.asarray(action).reshape(-1).tolist()))
"""
    result = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, timeout=600, cwd=os.getcwd()
    )
    assert result.returncode == 0, result.stderr[-2000:]
    line = [l for l in result.stdout.splitlines() if l.startswith("SM_RESULT ")][-1]
    action = np.asarray(json.loads(line[len("SM_RESULT "):]), np.float32)
    np.testing.assert_allclose(action, np.asarray(expected).reshape(-1), atol=1e-4)


def test_export_with_prediction_heads(tmp_path):
    from cusrl_tpu.hook import ReturnPrediction

    env = create_dummy_env()
    factory = cusrl_tpu.PpoAgentFactory(
        num_steps_per_update=8, actor_hidden_dims=(16,), critic_hidden_dims=(16,),
        sampler_epochs=1, sampler_mini_batches=1).to_underlying()
    factory.register_hook(ReturnPrediction(), after="on_policy_preparation")
    agent = factory(env.spec)
    run_training(agent, env, num_updates=1)
    agent.export(str(tmp_path), target_format="stablehlo", verbose=False)
    import yaml

    manifest = yaml.safe_load((tmp_path / "manifest.yaml").read_text())
    assert "return_prediction" in manifest["outputs"]


def test_export_onnx_requires_tf2onnx(tmp_path):
    """The onnx format is a guarded jax2tf->tf2onnx hop (SURVEY §2.7 maps the
    reference's torch.onnx path to StableHLO/TFLite as first-class formats);
    without tf2onnx it must fail fast, BEFORE importing TensorFlow."""
    import sys

    import pytest

    env = create_dummy_env()
    agent = make_agent(env)
    assert "tensorflow" not in sys.modules  # segfault hazard beside jax+torch
    with pytest.raises(ImportError, match="tf2onnx"):
        agent.export(str(tmp_path / "onnx"), target_format="onnx", verbose=False)
    assert "tensorflow" not in sys.modules


def test_export_onnx_with_fake_tf2onnx_subprocess(tmp_path):
    """With tf2onnx present, the onnx path builds the SavedModel and invokes
    tf2onnx.convert.from_saved_model on it.  TF cannot import beside jax+torch,
    so run in a clean subprocess with a FAKE tf2onnx recording the call."""
    import json
    import subprocess
    import sys

    script = f"""
import json, os, sys, types
sys.path.insert(0, {str(os.getcwd())!r})
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

calls = {{}}
fake = types.ModuleType("tf2onnx")
fake.convert = types.SimpleNamespace()
def from_saved_model(saved_dir, output_path=None):
    calls["saved_dir"] = saved_dir
    calls["output_path"] = output_path
    open(output_path, "wb").write(b"onnx-bytes")
    return object(), None
fake.convert.from_saved_model = from_saved_model
sys.modules["tf2onnx"] = fake

from tests.helpers import create_dummy_env
import cusrl_tpu
env = create_dummy_env()
agent = cusrl_tpu.PpoAgentFactory(num_steps_per_update=4, actor_hidden_dims=(8,), critic_hidden_dims=(8,),
                                  sampler_epochs=1, sampler_mini_batches=1)(env.spec)
agent.export({str(tmp_path / "onnx")!r}, target_format="onnx", verbose=False)
print("RESULT " + json.dumps({{
    "saved_model_exists": os.path.isdir(calls["saved_dir"]),
    "onnx_exists": os.path.isfile(calls["output_path"]),
    "manifest": os.path.isfile(os.path.join({str(tmp_path / "onnx")!r}, "manifest.yaml")),
}}))
"""
    proc = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, timeout=420,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")][-1]
    result = json.loads(line[len("RESULT "):])
    assert result == {"saved_model_exists": True, "onnx_exists": True, "manifest": True}
