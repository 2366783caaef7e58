"""Calendar tests (vs ice_calendar.F90 semantics)."""

from cice4_tpu.calendar import Calendar, is_leap


def test_advance_one_year_365():
    cal = Calendar(dt=3600.0, year_init=1997)
    assert cal.year == 1997 and cal.month == 1 and cal.mday == 1
    for _ in range(24 * 365):
        cal.advance()
    assert cal.year == 1998
    assert cal.month == 1 and cal.mday == 1
    assert cal.new_year


def test_month_boundaries():
    cal = Calendar(dt=86400.0, year_init=2000)
    months = [cal.month]
    for _ in range(364):
        cal.advance()
        if cal.new_month:
            months.append(cal.month)
    assert months == list(range(1, 13))


def test_yday_and_sec():
    cal = Calendar(dt=3600.0, year_init=1997)
    for _ in range(36):  # 1.5 days
        cal.advance()
    assert abs(cal.yday - 2.5) < 1e-9
    assert abs(cal.sec - 12 * 3600.0) < 1e-6


def test_write_flags():
    cal = Calendar(dt=3600.0, year_init=1997)
    dumps = 0
    hists = 0
    for _ in range(24 * 62):  # two months
        cal.advance()
        if cal.write_flag("m"):
            hists += 1
        if cal.write_flag("d"):
            dumps += 1
    assert hists == 2          # Feb 1, Mar 1
    assert dumps == 62         # every midnight crossing (Jan 2 .. Mar 4)


def test_leap_years():
    assert is_leap(2000)
    assert not is_leap(1900)
    assert is_leap(1996)
    assert not is_leap(1997)
    cal = Calendar(dt=86400.0, year_init=1996, use_leap_years=True)
    n = 0
    while cal.year == 1996:
        cal.advance()
        n += 1
    assert n == 366
