"""Input sources: deterministic synthetic world generator, CSV sniffing reader."""

from .worldgen import WorldParams, generate_world, world_dir_for, ensure_world  # noqa: F401
