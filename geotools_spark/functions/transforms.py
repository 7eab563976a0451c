"""Datum / epoch coordinate transforms (SURVEY.md §2.9 M1-M5): the
las2csrs pipeline re-expressed as vectorized NumPy kernels wrapped in
one Arrow-batched pandas UDF.

Pipeline parity with the reference (src/las2csrs.cpp:408-504):
1. source UTM -> geodetic (inverse transverse Mercator on the source
   ellipsoid) -> ECEF on GRS80 (proj4 `+proj=geocent +ellps=GRS80`);
2. 14-param Helmert to NAD83(CSRS) with dt = efrom - table epoch
   (src/las2csrs.cpp:237-265) — NOTE the reference updates x in place
   and then uses the UPDATED x when computing y, and updated x, y for
   z; `sequential=True` reproduces that quirk, False is the textbook
   simultaneous form;
3. if efrom != eto: ECEF -> geodetic, bilinearly sample the NAD83v6VG
   velocity grid (mm/yr -> m, src/las2csrs.cpp:36-40,142-169), convert
   the metric shifts to angular via the radii of curvature
   (src/las2csrs.cpp:53-71), apply x (eto - efrom), then geodetic ->
   target UTM; else ECEF -> target UTM directly.

The projection math is the classic proj4/Snyder transverse-Mercator
series (public domain formulas) — pyproj/GDAL are not installed in
this environment (SURVEY.md §7). Helmert parameters are the published
ITRF->NAD83(CSRS) tables (Craymer 2006), mirroring share/itrf.csv.

All kernels take/return NumPy arrays — no per-row Python anywhere.
"""

from __future__ import annotations

import math

import numpy as np

# --------------------------------------------------------------- ellipsoids

GRS80 = (6378137.0, 298.257222101)
WGS84 = (6378137.0, 298.257223563)

# EPSG code -> (ellipsoid, central meridian deg) for the UTM CRSs the
# reference's test matrix uses. All UTM: k0=.9996, x0=500000, y0=0.
UTM_CRS = {
    26910: (GRS80, -123.0),  # NAD83 / UTM 10N
    26912: (GRS80, -111.0),  # NAD83 / UTM 12N
    32611: (WGS84, -117.0),  # WGS84 / UTM 11N
    2955: (GRS80, -117.0),   # NAD83(CSRS) / UTM 11N
    2956: (GRS80, -111.0),   # NAD83(CSRS) / UTM 12N
    3157: (GRS80, -123.0),   # NAD83(CSRS) / UTM 10N
}

# ITRF -> NAD83(CSRS) 14-param Helmert table (Craymer; = share/itrf.csv):
# frame: (epoch, tx, ty, tz, rx, ry, rz, ds_ppb, dtx, dty, dtz, drx, dry, drz, dds_ppb)
# translations m, rotations mas, rates per year.
ITRF_PARAMS = {
    "itrf2008": (2010.00, 1.00370, -1.91111, -0.54397, -26.78138, 0.42027, -10.93206, 0.38891, 0.00079, -0.00060, -0.00134, -0.06667, 0.75744, 0.05133, -0.10201),
    "itrf2005": (1997.00, 0.99630, -1.90240, -0.52190, -25.91500, -9.42600, -11.59900, 0.77500, 0.00050, -0.00060, -0.00130, -0.06667, 0.75744, 0.05133, -0.10201),
    "itrf2000": (1997.00, 0.99560, -1.90130, -0.52150, -25.91500, -9.42600, -11.59900, 0.61500, 0.00070, -0.00070, 0.00050, -0.06667, 0.75744, 0.05133, -0.18200),
    "itrf97": (1997.00, 0.98890, -1.90740, -0.50300, -25.91500, -9.42600, -11.59900, -0.93500, 0.00070, -0.00010, 0.00190, -0.06667, 0.75744, 0.03133, -0.19200),
    "itrf96": (1997.00, 0.99100, -1.90720, -0.51290, -25.79000, -9.65000, -11.66000, 0.00000, 0.0, 0.0, 0.0, -0.05320, 0.74230, 0.03160, 0.0),
    "itrf94": (1997.00, 0.99100, -1.90720, -0.51290, -25.79000, -9.65000, -11.66000, 0.00000, 0.0, 0.0, 0.0, -0.05300, 0.74200, 0.03200, 0.0),
    "itrf93": (1997.00, 1.01110, -1.90580, -0.50510, -24.41000, -8.74000, -11.15000, -0.40000, 0.00290, -0.00040, -0.00080, 0.05700, 0.93200, -0.01800, 0.0),
    "itrf92": (1997.00, 0.98300, -1.90920, -0.50490, -25.79000, -9.65000, -11.66000, 0.80000, 0.0, 0.0, 0.0, -0.05300, 0.74200, 0.03200, 0.0),
    "itrf91": (1997.00, 0.97100, -1.92320, -0.49890, -25.79000, -9.65000, -11.66000, -0.60000, 0.0, 0.0, 0.0, -0.05300, 0.74200, 0.03200, 0.0),
    "itrf90": (1997.00, 0.97300, -1.91920, -0.48290, -25.79000, -9.65000, -11.66000, -0.90000, 0.0, 0.0, 0.0, -0.05300, 0.74200, 0.03200, 0.0),
    "itrf89": (1997.00, 0.96800, -1.94320, -0.44490, -25.79000, -9.65000, -11.66000, -4.30000, 0.0, 0.0, 0.0, -0.05300, 0.74200, 0.03200, 0.0),
    "itrf88": (1997.00, 0.97300, -1.90720, -0.42090, -25.89000, -9.65000, -11.66000, -7.40000, 0.0, 0.0, 0.0, -0.05300, 0.74200, 0.03200, 0.0),
    "nad83csrs": (1997.0,) + (0.0,) * 14,
}


def _mas2rad(x):
    """Milliarcseconds to radians (src/las2csrs.cpp:77)."""
    return x * 4.84813681 / 1e9


def _ellipsoid(e):
    a, rf = e
    f = 1.0 / rf
    e2 = f * (2.0 - f)
    return a, e2


# ------------------------------------------- transverse Mercator (proj4)


def _enfn(e2):
    """Meridian-distance series coefficients (proj4 pj_enfn)."""
    C00, C02, C04, C06, C08 = 1.0, 0.25, 0.046875, 0.01953125, 0.01068115234375
    C22, C24, C26, C28 = 0.75, 0.46875, 0.224609375, 0.1441955566406250
    C44, C46, C48 = 0.46875, 0.7265625, 0.5638671875
    C66, C68 = 0.36458333333333333333, 0.5696614583333333333
    C88 = 0.3076171875
    en = np.empty(5)
    en[0] = C00 - e2 * (C02 + e2 * (C04 + e2 * (C06 + e2 * C08)))
    en[1] = e2 * (C22 - e2 * (C04 + e2 * (C06 + e2 * C08)))
    t = e2 * e2
    en[2] = t * (C44 - e2 * (C46 + e2 * C48))
    t *= e2
    en[3] = t * (C66 - e2 * C68)
    en[4] = t * e2 * C88
    return en


def _mlfn(phi, sphi, cphi, en):
    cphi = cphi * sphi
    sphi = sphi * sphi
    return en[0] * phi - cphi * (en[1] + sphi * (en[2] + sphi * (en[3] + sphi * en[4])))


def _inv_mlfn(arg, e2, en):
    k = 1.0 / (1.0 - e2)
    phi = arg.copy()
    for _ in range(12):
        s = np.sin(phi)
        t = 1.0 - e2 * s * s
        t = (_mlfn(phi, s, np.cos(phi), en) - arg) * (t * np.sqrt(t)) * k
        phi = phi - t
        if np.all(np.abs(t) < 1e-12):
            break
    return phi


FC1, FC2, FC3, FC4, FC5, FC6, FC7, FC8 = (
    1.0, 0.5, 0.16666666666666666666, 0.08333333333333333333,
    0.05, 0.03333333333333333333, 0.02380952380952380952, 0.01785714285714285714,
)


def tmerc_fwd(lon, lat, *, ellps, lon0_deg, k0=0.9996, x0=500000.0, y0=0.0):
    """proj4 classic e_forward (tmerc). lon/lat radians -> x, y meters."""
    a, e2 = _ellipsoid(ellps)
    esp = e2 / (1.0 - e2)
    en = _enfn(e2)
    ml0 = _mlfn(0.0, 0.0, 1.0, en)  # lat0 = 0
    lam = lon - math.radians(lon0_deg)
    phi = lat
    sphi, cphi = np.sin(phi), np.cos(phi)
    t = np.where(np.abs(cphi) > 1e-10, sphi / cphi, 0.0)
    t = t * t
    al = cphi * lam
    als = al * al
    al = al / np.sqrt(1.0 - e2 * sphi * sphi)
    n = esp * cphi * cphi
    x = k0 * al * (
        FC1 + FC3 * als * (1.0 - t + n + FC5 * als * (
            5.0 + t * (t - 18.0) + n * (14.0 - 58.0 * t)
            + FC7 * als * (61.0 + t * (t * (179.0 - t) - 479.0))
        ))
    )
    y = k0 * (
        _mlfn(phi, sphi, cphi, en) - ml0
        + sphi * al * lam * FC2 * (
            1.0 + FC4 * als * (5.0 - t + n * (9.0 + 4.0 * n) + FC6 * als * (
                61.0 + t * (t - 58.0) + n * (270.0 - 330.0 * t)
                + FC8 * als * (1385.0 + t * (t * (543.0 - t) - 3111.0))
            ))
        )
    )
    return x * a + x0, y * a + y0


def tmerc_inv(x, y, *, ellps, lon0_deg, k0=0.9996, x0=500000.0, y0=0.0):
    """proj4 classic e_inverse (tmerc). x, y meters -> lon, lat radians."""
    a, e2 = _ellipsoid(ellps)
    esp = e2 / (1.0 - e2)
    en = _enfn(e2)
    ml0 = _mlfn(0.0, 0.0, 1.0, en)
    xx = (x - x0) / a
    yy = (y - y0) / a
    phi = _inv_mlfn(ml0 + yy / k0, e2, en)
    sphi, cphi = np.sin(phi), np.cos(phi)
    t = np.where(np.abs(cphi) > 1e-10, sphi / cphi, 0.0)
    n = esp * cphi * cphi
    con = 1.0 - e2 * sphi * sphi
    d = xx * np.sqrt(con) / k0
    con = con * t
    t = t * t
    ds = d * d
    lat = phi - (con * ds / (1.0 - e2)) * FC2 * (
        1.0 - ds * FC4 * (
            5.0 + t * (3.0 - 9.0 * n) + n * (1.0 - 4.0 * n)
            - ds * FC6 * (
                61.0 + t * (90.0 - 252.0 * n + 45.0 * t) + 46.0 * n
                - ds * FC8 * (1385.0 + t * (3633.0 + t * (4095.0 + 1574.0 * t)))
            )
        )
    )
    lon = d * (
        FC1 - ds * FC3 * (
            1.0 + 2.0 * t + n
            - ds * FC5 * (
                5.0 + t * (28.0 + 24.0 * t + 8.0 * n) + 6.0 * n
                - ds * FC7 * (61.0 + t * (662.0 + t * (1320.0 + 720.0 * t)))
            )
        )
    ) / cphi
    return lon + math.radians(lon0_deg), lat


# ------------------------------------------------- geodetic <-> geocentric


def geodetic_to_ecef(lon, lat, h, *, ellps=GRS80):
    a, e2 = _ellipsoid(ellps)
    s = np.sin(lat)
    n = a / np.sqrt(1.0 - e2 * s * s)
    x = (n + h) * np.cos(lat) * np.cos(lon)
    y = (n + h) * np.cos(lat) * np.sin(lon)
    z = (n * (1.0 - e2) + h) * s
    return x, y, z


def ecef_to_geodetic(x, y, z, *, ellps=GRS80, iters=6):
    """Iterative (Bowring-seeded fixed point) — converges < 1e-12 rad in
    a handful of iterations at terrestrial heights."""
    a, e2 = _ellipsoid(ellps)
    lon = np.arctan2(y, x)
    p = np.sqrt(x * x + y * y)
    lat = np.arctan2(z, p * (1.0 - e2))
    for _ in range(iters):
        s = np.sin(lat)
        n = a / np.sqrt(1.0 - e2 * s * s)
        h = p / np.cos(lat) - n
        lat = np.arctan2(z, p * (1.0 - e2 * n / (n + h)))
    s = np.sin(lat)
    n = a / np.sqrt(1.0 - e2 * s * s)
    h = p / np.cos(lat) - n
    return lon, lat, h


# ------------------------------------------------------------- Helmert M1


def helmert_epoch(x, y, z, frame: str, efrom: float, *, sequential: bool = True):
    """14-param Helmert to NAD83(CSRS) at dt = efrom - table_epoch
    (src/las2csrs.cpp:237-265). sequential=True reproduces the
    reference's in-place update order (y uses the already-transformed
    x, z uses transformed x and y)."""
    p = ITRF_PARAMS[frame]
    epoch, tx, ty, tz, rx, ry, rz, ds, dtx, dty, dtz, drx, dry, drz, dds = p
    dt = efrom - epoch
    txt = tx + dtx * dt
    tyt = ty + dty * dt
    tzt = tz + dtz * dt
    dst = ds / 1e9 + (dds / 1e9) * dt + 1.0
    rxt = _mas2rad(rx + drx * dt)
    ryt = _mas2rad(ry + dry * dt)
    rzt = _mas2rad(rz + drz * dt)
    if sequential:
        xn = txt + dst * x + (-rzt) * y + ryt * z
        yn = tyt + rzt * xn + dst * y + (-rxt) * z
        zn = tzt + (-ryt) * xn + rxt * yn + dst * z
    else:
        xn = txt + dst * x + (-rzt) * y + ryt * z
        yn = tyt + rzt * x + dst * y + (-rxt) * z
        zn = tzt + (-ryt) * x + rxt * y + dst * z
    return xn, yn, zn


# ------------------------------------------------- shift grid M5 + M3


def bilinear_shift(grid: np.ndarray, transform, lon_rad, lat_rad):
    """Sample bands 0..2 of the velocity grid at lon/lat (radians) with
    the reference's clamped bilinear (src/las2csrs.cpp:36-40,142-169).
    Returns (dx, dy, dz) in meters/yr (grid stores mm/yr)."""
    lon = np.degrees(lon_rad)
    lat = np.degrees(lat_rad)
    height, width = grid.shape[:2]
    c = (lon - transform[0]) / transform[1]
    r = (lat - transform[3]) / transform[5]
    c0 = c.astype(np.int64)
    r0 = r.astype(np.int64)
    c1 = c0 + 1
    r1 = r0 + 1
    c0 = np.clip(c0, 0, None)
    r0 = np.clip(r0, 0, None)
    c1 = np.minimum(c1, width - 1)
    r1 = np.minimum(r1, height - 1)
    out = []
    for b in range(3):
        g = grid[:, :, b]
        x1 = (c1 - c) / (c1 - c0) * g[r0, c0] + (c - c0) / (c1 - c0) * g[r0, c1]
        x2 = (c1 - c) / (c1 - c0) * g[r1, c0] + (c - c0) / (c1 - c0) * g[r1, c1]
        out.append(((r1 - r) / (r1 - r0) * x1 + (r - r0) / (r1 - r0) * x2) / 1000.0)
    return out[0], out[1], out[2]


def shift_to_latlon(dx, dy, lat, h, *, ellps=GRS80):
    """Metric shifts -> angular via radii of curvature
    (src/las2csrs.cpp:53-71). Returns (dlon, dlat) radians."""
    a, e2 = _ellipsoid(ellps)
    s2 = np.sin(lat) ** 2
    m = a * (1.0 - e2) / (1.0 - e2 * s2) ** 1.5   # meridional
    n = a / (1.0 - e2 * s2) ** 0.5                # parallel
    r = n * np.cos(lat)                            # radius of parallel
    return dx / (r + h), dy / (m + h)


# ------------------------------------------------------ full pipeline


class Las2CsrsTransform:
    """The complete las2csrs point transform as one vectorized callable
    (NumPy in, NumPy out) — suitable for direct use in a pandas UDF."""

    def __init__(
        self,
        shift_grid: np.ndarray,
        shift_transform,
        *,
        ffrom: str,
        efrom: float,
        eto: float,
        fsrid: int,
        tsrid: int,
        sequential_helmert: bool = True,
    ):
        self.grid = shift_grid
        self.gt = shift_transform
        self.ffrom = ffrom
        self.efrom = float(efrom)
        self.eto = float(eto)
        self.from_crs = UTM_CRS[fsrid]
        self.to_crs = UTM_CRS[tsrid]
        self.sequential = sequential_helmert

    def __call__(self, x, y, z):
        fell, flon0 = self.from_crs
        tell, tlon0 = self.to_crs
        lon, lat = tmerc_inv(np.asarray(x, float), np.asarray(y, float), ellps=fell, lon0_deg=flon0)
        ex, ey, ez = geodetic_to_ecef(lon, lat, np.asarray(z, float), ellps=GRS80)
        ex, ey, ez = helmert_epoch(
            ex, ey, ez, self.ffrom, self.efrom, sequential=self.sequential
        )
        if self.efrom != self.eto:
            lon1, lat1, h1 = ecef_to_geodetic(ex, ey, ez, ellps=GRS80)
            dx, dy, dz = bilinear_shift(self.grid, self.gt, lon1, lat1)
            dlon, dlat = shift_to_latlon(dx, dy, lat1, h1, ellps=tell)
            dt = self.eto - self.efrom
            lon1 = lon1 + dlon * dt
            lat1 = lat1 + dlat * dt
            h1 = h1 + dz * dt
            xo, yo = tmerc_fwd(lon1, lat1, ellps=tell, lon0_deg=tlon0)
            return xo, yo, h1
        lon1, lat1, h1 = ecef_to_geodetic(ex, ey, ez, ellps=GRS80)
        xo, yo = tmerc_fwd(lon1, lat1, ellps=tell, lon0_deg=tlon0)
        return xo, yo, h1
