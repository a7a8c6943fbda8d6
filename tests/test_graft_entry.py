"""Driver artifacts must keep working: entry() compiles, dryrun_multichip
runs a sharded train step + halo inference on the virtual mesh."""

import jax


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 64, 64, 2)


def test_dryrun_multichip_eight():
    import __graft_entry__ as ge

    ge.dryrun_multichip(jax.device_count())


def test_dryrun_multichip_one():
    import __graft_entry__ as ge

    ge.dryrun_multichip(1)
