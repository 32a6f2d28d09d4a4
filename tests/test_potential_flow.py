import numpy as np

from openfoam_tpp_tpu.utils import potential_flow as pf


def test_wall_amplitude_matches_reference_oracle():
    """The shipped production case's potential-flow output
    (post_flow.117896.out): R=0.1, a=0.004, f=1.88, d=0.104 =>
    A_PT = 3.146940e-02 m, Δh = 6.293879e-02 m, F = 0.056894."""
    s = pf.predict(R=0.1, a=0.004, freq=1.88, d=0.104, n_modes=30)
    assert abs(s["F"] - 0.056894) < 1e-6
    assert abs(s["A_PT"] - 3.146940e-02) < 1e-7
    assert abs(s["Delta_h_PT"] - 6.293879e-02) < 2e-7
    assert abs(s["omega"] - 11.8124) < 1e-4


def test_natural_frequencies_formula():
    omega_n, eps = pf.natural_frequencies(R=0.1, d=0.104, n_modes=5)
    # First J1' zero and dispersion relation.
    assert abs(eps[0] - 1.8412) < 1e-4
    lam = eps[0] / 0.1
    assert abs(omega_n[0] - np.sqrt(9.81 * lam * np.tanh(lam * 0.104))) < 1e-10


def test_exact_roots_close_to_table():
    try:
        import scipy  # noqa: F401
    except ImportError:
        return
    exact = pf.bessel_j1prime_zeros(5, root_mode="exact")
    table = pf.bessel_j1prime_zeros(5, root_mode="reference")
    assert np.allclose(exact, table, atol=5e-4)


def test_csv_schema(tmp_path):
    out, summary = pf.generate_wall_elevation_csv(
        str(tmp_path), R=0.1, a=0.004, freq=1.88, d=0.104,
        duration=0.1, dt=0.05, n_theta=8,
    )
    lines = open(out).read().strip().split("\n")
    assert lines[0] == "time,theta,zeta_wall"
    n_times = len(np.arange(0.0, 0.1 + 0.05, 0.05))  # reference arange semantics
    assert len(lines) == 1 + n_times * 8
    t0, th0, z0 = lines[1].split(",")
    assert t0 == "0.000000" and th0 == "0.000000"
    assert abs(float(z0) - summary["A_PT"]) < 1e-9


def test_wall_elevation_rotates_with_orbit():
    a_pt, omega = 0.01, 2.0
    th = np.linspace(0, 2 * np.pi, 16, endpoint=False)
    z0 = pf.wall_elevation(th, 0.0, a_pt, omega)
    # Crest at theta = omega*t.
    t1 = 0.7
    z1 = pf.wall_elevation(th, t1, a_pt, omega)
    assert np.argmax(z1) == np.argmin(np.abs(((th - omega * t1 + np.pi) % (2 * np.pi)) - np.pi))
    assert abs(z0.max() - a_pt) < 1e-12
