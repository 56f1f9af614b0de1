from .ocean import make_ocean_step, init_ocean_state, ocean_forcing_from_mean  # noqa: F401
