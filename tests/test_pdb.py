"""PDB IO: fixed-column parsing against a hand-written file,
write/read round trips, multi-model trajectories, and the topology
helpers that feed CG mapping layers."""

import numpy as np
import pytest

from vaemolsim_tpu.data.pdb import PDBTopology, read_pdb, write_pdb

HAND_WRITTEN = """\
CRYST1   25.000   30.000   35.000  90.00  90.00  90.00 P 1           1
ATOM      1  N   ALA A   1      11.104   6.134  -6.504  1.00  0.00           N
ATOM      2  CA  ALA A   1      11.639   6.071  -5.147  1.00  0.00           C
ATOM      3  C   ALA A   1      10.729   6.768  -4.123  1.00  0.00           C
ATOM      4  O   ALA A   1       9.704   7.365  -4.473  1.00  0.00           O
ATOM      5  N   GLY A   2      11.101   6.719  -2.841  1.00  0.00           N
ATOM      6  CA  GLY A   2      10.312   7.350  -1.778  1.00  0.00           C
HETATM    7  O   HOH A   3       2.000   3.000   4.000  1.00  0.00           O
END
"""


@pytest.fixture
def hand_file(tmp_path):
    p = tmp_path / "mini.pdb"
    p.write_text(HAND_WRITTEN)
    return str(p)


class TestRead:

    def test_fixed_columns_exact(self, hand_file):
        coords, topo, box = read_pdb(hand_file)
        assert coords.shape == (1, 7, 3)
        np.testing.assert_allclose(coords[0, 0],
                                   [11.104, 6.134, -6.504], atol=1e-5)
        np.testing.assert_allclose(coords[0, 6], [2.0, 3.0, 4.0],
                                   atol=1e-5)
        np.testing.assert_allclose(box, [25.0, 30.0, 35.0])
        assert topo.atom_names == ["N", "CA", "C", "O", "N", "CA", "O"]
        assert topo.res_names == ["ALA", "ALA", "ALA", "ALA", "GLY",
                                  "GLY", "HOH"]
        np.testing.assert_array_equal(topo.res_ids,
                                      [1, 1, 1, 1, 2, 2, 3])
        assert topo.elements == ["N", "C", "C", "O", "N", "C", "O"]
        assert topo.chain_ids == ["A"] * 7

    def test_topology_helpers(self, hand_file):
        _, topo, _ = read_pdb(hand_file)
        assert topo.residues() == [("ALA", 1), ("GLY", 2), ("HOH", 3)]
        np.testing.assert_array_equal(topo.res_atom_nums(), [4, 2, 1])
        m = topo.masses()
        np.testing.assert_allclose(m[:2], [14.007, 12.011], atol=1e-3)

    def test_no_atoms_raises(self, tmp_path):
        p = tmp_path / "empty.pdb"
        p.write_text("REMARK nothing here\nEND\n")
        with pytest.raises(ValueError, match="no ATOM"):
            read_pdb(str(p))


class TestRoundTrip:

    def test_single_frame_round_trip(self, tmp_path, hand_file):
        coords, topo, box = read_pdb(hand_file)
        out = str(tmp_path / "rt.pdb")
        write_pdb(out, coords, topo, box=box)
        c2, t2, b2 = read_pdb(out)
        np.testing.assert_allclose(c2, coords, atol=1e-3)
        assert t2.atom_names == topo.atom_names
        assert t2.res_names == topo.res_names
        np.testing.assert_array_equal(t2.res_ids, topo.res_ids)
        assert t2.elements == topo.elements
        np.testing.assert_allclose(b2, box)

    def test_multi_model_round_trip(self, tmp_path):
        rng = np.random.default_rng(0)
        coords = rng.normal(size=(5, 4, 3)).astype(np.float32) * 10
        out = str(tmp_path / "traj.pdb")
        write_pdb(out, coords)
        c2, topo, box = read_pdb(out)
        assert c2.shape == (5, 4, 3)
        np.testing.assert_allclose(c2, coords, atol=1e-3)
        assert box is None
        assert topo.res_names == ["MOL"] * 4

    def test_single_frame_2d_input(self, tmp_path):
        coords = np.arange(12, dtype=np.float32).reshape(4, 3)
        out = str(tmp_path / "one.pdb")
        write_pdb(out, coords)
        c2, _, _ = read_pdb(out)
        assert c2.shape == (1, 4, 3)
        np.testing.assert_allclose(c2[0], coords, atol=1e-3)

    def test_topology_size_mismatch_raises(self, tmp_path):
        topo = PDBTopology(atom_names=["C"], res_names=["MOL"],
                           res_ids=np.array([1]), chain_ids=["A"],
                           elements=["C"])
        with pytest.raises(ValueError, match="topology"):
            write_pdb(str(tmp_path / "x.pdb"),
                      np.zeros((1, 2, 3), np.float32), topo)

    def test_unequal_models_raise(self, tmp_path):
        p = tmp_path / "bad.pdb"
        p.write_text(
            "MODEL        1\n"
            "ATOM      1  C   MOL A   1       0.000   0.000   0.000"
            "  1.00  0.00           C\n"
            "ATOM      2  C   MOL A   1       1.000   0.000   0.000"
            "  1.00  0.00           C\n"
            "ENDMDL\nMODEL        2\n"
            "ATOM      1  C   MOL A   1       0.000   0.000   0.000"
            "  1.00  0.00           C\n"
            "ENDMDL\nEND\n")
        with pytest.raises(ValueError, match="unequal"):
            read_pdb(str(p))
