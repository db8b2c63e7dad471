from rsoderh_raytracing_tpu.env.environment import (  # noqa: F401
    Environment,
    EnvironmentMaps,
    load_default_environments,
)
