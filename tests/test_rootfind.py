import math

import pytest

from fabber_core_tpu.core.rootfind import (DescendingZeroFinder,
                                           RiddlersGuess, bisection_guess,
                                           interp_guess, log_bisection_guess)


def descending(x):
    return 5.0 - x  # root at 5


def descending_exp(x):
    return math.exp(-x) - 0.1  # root at ln(10)


class TestGuesstimators:
    def test_bisection(self):
        assert bisection_guess(0, 10, 1, -1) == 5

    def test_log_bisection(self):
        assert log_bisection_guess(1, 100, 1, -1) == pytest.approx(10)

    def test_interp(self):
        # f(0)=2, f(10)=-2 -> root estimate at 5
        assert interp_guess(0, 10, 2, -2) == pytest.approx(5)


class TestDescendingZeroFinder:
    @pytest.mark.parametrize("guesser", ["bisection", "interp", "riddlers"])
    def test_linear_root(self, guesser):
        finder = DescendingZeroFinder(descending, guess=0.0, scale=2.0,
                                      tol_y=1e-10, guesstimator=guesser)
        assert finder.find_zero() == pytest.approx(5.0, abs=1e-6)

    def test_exp_root_log_guessers(self):
        finder = DescendingZeroFinder(descending_exp, search_min=1e-6,
                                      search_max=100.0, guess=1.0, scale=2.0,
                                      tol_y=1e-12,
                                      guesstimator="logbisection")
        assert finder.find_zero() == pytest.approx(math.log(10), abs=1e-5)

    def test_boundary_clamp(self):
        # root outside [searchMin, searchMax] -> clamps at boundary
        finder = DescendingZeroFinder(descending, search_min=0.0,
                                      search_max=2.0, guess=1.0, scale=1.0,
                                      tol_x=1e-8)
        assert finder.find_zero() == pytest.approx(2.0)

    def test_tol_x_stop(self):
        calls = []

        def f(x):
            calls.append(x)
            return 5.0 - x

        DescendingZeroFinder(f, guess=0.0, scale=10.0, tol_x=0.5).find_zero()
        # coarse tolerance: should converge quickly
        assert len(calls) < 12
