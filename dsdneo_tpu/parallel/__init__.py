from dsdneo_tpu.parallel.mesh import (dryrun_multichip,
                                      make_sharded_frontend,
                                      make_sharded_voice_step)

__all__ = ["make_sharded_frontend", "make_sharded_voice_step",
           "dryrun_multichip"]
