from dsdneo_tpu.parallel.mesh import (make_sharded_frontend, training_step,
                                      dryrun_multichip)

__all__ = ["make_sharded_frontend", "training_step", "dryrun_multichip"]
