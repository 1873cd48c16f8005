"""Cross-topology checkpoint restore (train on pod -> eval on one chip).

Regression for restore_checkpoint_tree: StandardCheckpointer replays the
SAVED shardings, so a checkpoint written under an 8-device mesh refuses
to load in a 1-device process ("available devices are different from
the devices used to save"). The reference's torch.load has no such
failure mode (train_utils.py:126-136), so ours must not either.

The parent saves a NamedSharding-sharded tree on the suite's 8-device
CPU mesh; a 1-device subprocess proves the naive restore fails and the
topology-tolerant helper restores the same values as host numpy.
"""

import os
import subprocess
import sys
import textwrap

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_restore_on_fewer_devices(tmp_path):
    import orbax.checkpoint as ocp

    devs = jax.devices()
    assert len(devs) == 8, "suite runs with 8 virtual CPU devices"
    mesh = Mesh(np.array(devs), ("dp",))
    w = jnp.arange(16.0, dtype=jnp.float32).reshape(8, 2)
    payload = {
        "params": {"w": jax.device_put(w, NamedSharding(mesh, P("dp")))},
        "step": jnp.asarray(7, jnp.int32),
    }
    ckpt = str(tmp_path / "ckpt")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(ckpt, payload, force=True)
    ckptr.wait_until_finished()

    child = textwrap.dedent(f"""
        import jax
        jax.config.update("jax_platforms", "cpu")
        import numpy as np
        assert jax.device_count() == 1, jax.device_count()

        import orbax.checkpoint as ocp
        try:
            ocp.StandardCheckpointer().restore({ckpt!r})
            raise SystemExit("naive restore unexpectedly succeeded: "
                             "the regression test is vacuous")
        except ValueError:
            pass

        from poco_tpu.utils.checkpoint_convert import restore_checkpoint_tree
        t = restore_checkpoint_tree({ckpt!r})
        w = np.asarray(t["params"]["w"])
        assert w.shape == (8, 2), w.shape
        np.testing.assert_array_equal(
            w, np.arange(16.0, dtype=np.float32).reshape(8, 2)
        )
        assert int(np.asarray(t["step"])) == 7
        print("topology-restore-ok")
    """)
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-c", child], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "topology-restore-ok" in r.stdout
