from .actor_critic import (ActorCritic, ActorCriticConfig, ActorCriticLossConfig,
                           ActorCriticOutput, compute_lambda_returns)
from .agent import Agent, AgentConfig, MODEL_NAMES, configure_opt
from .denoiser import (Conditioners, Denoiser, DenoiserConfig, SigmaDistributionConfig,
                       downsample_avg, quantize_to_uint8_grid, upsample_frame)
from .diffusion_sampler import (DiffusionSampler, DiffusionSamplerConfig, TwoStageSampler,
                                build_sigmas)
from .inner_model import InnerModel, InnerModelConfig
from .rew_end_model import RewEndModel, RewEndModelConfig
