"""`play --pretrained` exercised END-TO-END, OFFLINE (round-2 VERDICT component #24).

The published HF checkpoint itself is unreachable (zero egress — probed and banked every
round in VALIDATION.md), but every LINE of the --pretrained code path can still run for
real: this test builds a reference-FORMAT agent checkpoint from the reference's own torch
modules (/root/reference/src, used as a numerical/format oracle, never copied), seeds a
local huggingface_hub cache with it in the exact refs/snapshots layout hf_hub_download
resolves offline, and drives ``python -m diamond_tpu.play --pretrained`` headless in a
subprocess with HF_HUB_OFFLINE=1. So hf_hub_download, the published-config override
(reference src/play.py:76-80), the state-dict converter (interop/torch_ckpt.py), agent
load, real-env seed collection (the scripted-ALE gym stack), and the world-model play
loop all execute unmodified. The one thing this cannot prove is the byte content of the
published weights; dims here are tiny stand-ins wired through the same yaml structure
(including the ``_target_`` keys our loader must strip).
"""

import os
import subprocess
import sys
import types
from pathlib import Path

import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("huggingface_hub")
pytest.importorskip("pygame")

REF = "/root/reference/src"
REPO = Path(__file__).resolve().parents[1]

IMG, NA, NC = 16, 4, 4  # FakeALE has 4 actions (envs/fake_ale.py)


def _ref_state_dict():
    """Flat agent state dict in the reference's own format (reference agent.py:55-62)."""
    for name in ("wandb", "ale_py"):
        sys.modules.setdefault(name, types.ModuleType(name))
    if "omegaconf" not in sys.modules:
        m = types.ModuleType("omegaconf")
        m.OmegaConf = object
        m.DictConfig = dict
        sys.modules["omegaconf"] = m
    if "torcheval" not in sys.modules:
        m = types.ModuleType("torcheval")
        mm = types.ModuleType("torcheval.metrics")
        mf = types.ModuleType("torcheval.metrics.functional")
        mf.multiclass_confusion_matrix = lambda *a, **k: None
        sys.modules["torcheval"] = m
        sys.modules["torcheval.metrics"] = mm
        sys.modules["torcheval.metrics.functional"] = mf
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models.actor_critic import ActorCritic as RefAC
    from models.actor_critic import ActorCriticConfig as RefACConfig
    from models.diffusion.denoiser import Denoiser as RefDenoiser
    from models.diffusion.denoiser import DenoiserConfig as RefDenoiserConfig
    from models.diffusion.inner_model import InnerModelConfig as RefInnerCfg
    from models.rew_end_model import RewEndModel as RefRewEnd
    from models.rew_end_model import RewEndModelConfig as RefRewEndCfg

    torch.manual_seed(0)
    den = RefDenoiser(RefDenoiserConfig(
        sigma_data=0.5, sigma_offset_noise=0.3,
        inner_model=RefInnerCfg(img_channels=3, num_steps_conditioning=NC,
                                cond_channels=16, depths=[1, 1], channels=[8, 8],
                                attn_depths=[0, 0], num_actions=NA))).eval()
    rew_end = RefRewEnd(RefRewEndCfg(lstm_dim=32, img_channels=3, img_size=IMG,
                                     cond_channels=8, depths=[1, 1], channels=[8, 8],
                                     attn_depths=[0, 0], num_actions=NA)).eval()
    ac = RefAC(RefACConfig(lstm_dim=32, img_channels=3, img_size=IMG, channels=[8, 8],
                           down=[1, 1], num_actions=NA)).eval()
    flat = {}
    for prefix, mod in (("denoiser", den), ("rew_end_model", rew_end),
                        ("actor_critic", ac)):
        for k, v in mod.state_dict().items():
            flat[f"{prefix}.{k}"] = v
    return flat


# "Published" config groups at the checkpoint's tiny dims, in the reference's yaml
# structure: _target_ instantiation keys (must be stripped by compose_pretrained_config)
# and ${...} interpolations (must resolve through our loader).
AGENT_YAML = f"""\
_target_: agent.AgentConfig
denoiser:
  _target_: models.diffusion.DenoiserConfig
  sigma_data: 0.5
  sigma_offset_noise: 0.3
  inner_model:
    _target_: models.diffusion.InnerModelConfig
    img_channels: 3
    num_steps_conditioning: {NC}
    cond_channels: 16
    depths: [1, 1]
    channels: [8, 8]
    attn_depths: [0, 0]
rew_end_model:
  _target_: models.rew_end_model.RewEndModelConfig
  lstm_dim: 32
  img_channels: ${{agent.denoiser.inner_model.img_channels}}
  img_size: ${{env.train.size}}
  cond_channels: 8
  depths: [1, 1]
  channels: [8, 8]
  attn_depths: [0, 0]
actor_critic:
  _target_: models.actor_critic.ActorCriticConfig
  lstm_dim: 32
  img_channels: ${{agent.denoiser.inner_model.img_channels}}
  img_size: ${{env.train.size}}
  channels: [8, 8]
  down: [1, 1]
"""

ENV_YAML = f"""\
train:
  id: BreakoutNoFrameskip-v4
  done_on_life_loss: True
  size: {IMG}
  max_episode_steps: 60
test:
  id: ${{..train.id}}
  done_on_life_loss: False
  size: ${{..train.size}}
  max_episode_steps: 60
keymap: atari/${{.train.id}}
"""


@pytest.mark.slow
def test_play_pretrained_offline_hub_cache(tmp_path):
    # 1) seed the hub cache exactly as huggingface_hub lays it out
    rev = "0" * 40
    repo_dir = tmp_path / "hub" / "models--eloialonso--diamond"
    (repo_dir / "refs").mkdir(parents=True)
    (repo_dir / "refs" / "main").write_text(rev)
    snap = repo_dir / "snapshots" / rev / "atari_100k"
    (snap / "models").mkdir(parents=True)
    (snap / "config" / "agent").mkdir(parents=True)
    (snap / "config" / "env").mkdir(parents=True)
    torch.save(_ref_state_dict(), snap / "models" / "FakeALE.pt")
    (snap / "config" / "agent" / "default.yaml").write_text(AGENT_YAML)
    (snap / "config" / "env" / "atari.yaml").write_text(ENV_YAML)

    # 2) an empty run dir: --pretrained must not need any local checkpoint/config
    run_dir = tmp_path / "run"
    run_dir.mkdir()

    # 3) drive the play app for real, offline, headless
    # PALLAS_AXON_* dropped: the tunnel PJRT registration in sitecustomize blocks the
    # child's `import jax` for minutes when the platform is wedged, even with CPU forced.
    env = {k: v for k, v in os.environ.items() if not k.startswith("PALLAS_AXON")}
    env.update(HF_HUB_CACHE=str(tmp_path / "hub"), HF_HUB_OFFLINE="1",
               HF_HOME=str(tmp_path / "hf_home"),
               SDL_VIDEODRIVER="dummy",
               JAX_PLATFORM_NAME="cpu", JAX_PLATFORMS="cpu",
               PYTHONPATH=str(REPO))
    out = subprocess.run(
        [sys.executable, "-m", "diamond_tpu.play", "--run-dir", str(run_dir),
         "--pretrained", "--game", "FakeALE", "-n", "40", "--horizon", "6",
         "--smoke", "8"],
        env=env, capture_output=True, text=True, timeout=1500)
    assert out.returncode == 0, out.stdout[-3000:] + "\n" + out.stderr[-3000:]
    assert "loaded pretrained FakeALE from the HF Hub" in out.stdout
