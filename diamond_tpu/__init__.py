"""diamond_tpu: TPU-native (JAX/XLA/Pallas) framework with the capabilities of
eloialonso/diamond — an RL agent trained entirely inside an EDM diffusion world model.

Blueprint: SURVEY.md at the repo root. Reference anchors cited per-module as
``reference: src/<file>:<lines>``.
"""

__version__ = "0.1.0"
