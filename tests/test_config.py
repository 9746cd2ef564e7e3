"""Config reader + unit conversion tests against reference formulas
(mechanics/constantConversion.cpp:36-59) and the pipeflow config values."""

import math
import os
import textwrap

import numpy as np
import pytest

from hemocell_tpu.config import Config, Parameters

PIPEFLOW_XML = textwrap.dedent(
    """\
    <?xml version="1.0" ?>
    <hemocell>
    <ibm>
        <stepMaterialEvery> 20 </stepMaterialEvery>
        <stepParticleEvery> 5 </stepParticleEvery>
    </ibm>
    <domain>
        <rhoP> 1025 </rhoP>
        <nuP> 1.1e-6 </nuP>
        <dx> 5e-7 </dx>
        <dt> 1e-7 </dt>
        <kBT> 4.100531391e-21 </kBT>
        <Re> 0.5 </Re>
        <particleEnvelope> 25 </particleEnvelope>
        <kRep> 2e-22 </kRep>
        <RepCutoff> 0.7 </RepCutoff>
    </domain>
    <sim>
        <tmax> 100000 </tmax>
        <tmeas> 1000 </tmeas>
    </sim>
    </hemocell>
    """
)


@pytest.fixture
def cfg(tmp_path):
    p = tmp_path / "config.xml"
    p.write_text(PIPEFLOW_XML)
    return Config(str(p))


def test_config_reads(cfg):
    assert cfg["domain"]["dx"].read(float) == 5e-7
    assert cfg["sim"]["tmax"].read(int) == 100000
    assert cfg["ibm"]["stepMaterialEvery"].read(int) == 20
    assert cfg["domain"].get("missing", float, 42.0) == 42.0
    with pytest.raises(KeyError):
        cfg["domain"]["nothere"]


def test_parameters_pipeflow(cfg):
    p = Parameters.from_config(cfg)
    # nu_lbm = 1.1e-6 * 1e-7 / (5e-7)^2 = 0.44
    np.testing.assert_allclose(p.nu_lbm, 0.44)
    np.testing.assert_allclose(p.tau, 3 * 0.44 + 0.5)
    np.testing.assert_allclose(p.dm, 1025 * (5e-7) ** 3)
    np.testing.assert_allclose(p.df, p.dm * 5e-7 / 1e-14)
    np.testing.assert_allclose(p.kBT_lbm, 4.100531391e-21 / (p.df * 5e-7))
    # force cap: 50 pN in lu
    np.testing.assert_allclose(p.f_limit, 50e-12 / p.df)


def test_parameters_auto_dt(tmp_path):
    xml = PIPEFLOW_XML.replace("<dt> 1e-7 </dt>", "<dt> -1 </dt>")
    p = tmp_path / "c.xml"
    p.write_text(xml)
    par = Parameters.from_config(Config(str(p)))
    assert par.tau == 1.0
    np.testing.assert_allclose(par.nu_lbm, 1.0 / 6.0)
    np.testing.assert_allclose(par.dt, par.nu_lbm / 1.1e-6 * (5e-7) ** 2)


def test_pipe_flow_setup(cfg):
    p = Parameters.from_config(cfg)
    # a 25 lu radius circle
    area = math.pi * 25**2
    p.pipe_flow(cfg, area)
    np.testing.assert_allclose(p.pipe_radius, 25.0)
    np.testing.assert_allclose(p.u_lbm_max, 0.5 * p.nu_lbm / 50.0)
