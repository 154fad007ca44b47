#!/usr/bin/env python3
"""Re-derive the reference's deterministic pipeline (rustc-hash FxHash64,
rand 0.8.5 StdRng = PCG32 seed expansion -> ChaCha12, Uniform/Normal samplers)
and check bit-exactness against every golden vector in
/root/reference/test/sql/lsh/*.test.  Dev tool only; the Scala port mirrors this.
"""
import math, struct

M64 = (1 << 64) - 1
FX_K = 0x517CC1B727220A95

def rotl5(h): return ((h << 5) | (h >> 59)) & M64

class Fx:
    __slots__ = ("h",)
    def __init__(self): self.h = 0
    def add(self, w):
        self.h = ((rotl5(self.h) ^ w) * FX_K) & M64
        return self
    def fin(self): return self.h

def fx_chars(cps):
    f = Fx(); f.add(len(cps))
    for c in cps: f.add(c)
    return f.fin() & 0xFFFFFFFF

def shingles_from_text(text, w):
    cps = [ord(c) for c in text]
    return {fx_chars(cps[i:i+w]) for i in range(len(cps) - w + 1)}

def shingles_from_list(strs):
    return {fx_chars([ord(c) for c in s]) for s in strs}

# ---- ChaCha12 (rand_chacha 0.3.1), seeded per rand_core 0.6 seed_from_u64 ----
def seed_key(state):
    MUL, INC = 6364136223846793005, 11634580027462260723
    out = []
    for _ in range(8):
        state = (state * MUL + INC) & M64
        xs = (((state >> 18) ^ state) >> 27) & 0xFFFFFFFF
        rot = state >> 59
        out.append(((xs >> rot) | (xs << (32 - rot) & 0xFFFFFFFF)) & 0xFFFFFFFF if rot else xs)
    return out  # 8 u32 key words (little-endian of the 32-byte seed)

def chacha_block(key, counter, rounds=12):
    st = [0x61707865, 0x3320646E, 0x79622D32, 0x6B206574] + key + \
         [counter & 0xFFFFFFFF, (counter >> 32) & 0xFFFFFFFF, 0, 0]
    x = st[:]
    def qr(a, b, c, d):
        x[a] = (x[a] + x[b]) & 0xFFFFFFFF; x[d] ^= x[a]; x[d] = ((x[d] << 16) | (x[d] >> 16)) & 0xFFFFFFFF
        x[c] = (x[c] + x[d]) & 0xFFFFFFFF; x[b] ^= x[c]; x[b] = ((x[b] << 12) | (x[b] >> 20)) & 0xFFFFFFFF
        x[a] = (x[a] + x[b]) & 0xFFFFFFFF; x[d] ^= x[a]; x[d] = ((x[d] << 8) | (x[d] >> 24)) & 0xFFFFFFFF
        x[c] = (x[c] + x[d]) & 0xFFFFFFFF; x[b] ^= x[c]; x[b] = ((x[b] << 7) | (x[b] >> 25)) & 0xFFFFFFFF
    for _ in range(rounds // 2):
        qr(0, 4, 8, 12); qr(1, 5, 9, 13); qr(2, 6, 10, 14); qr(3, 7, 11, 15)
        qr(0, 5, 10, 15); qr(1, 6, 11, 12); qr(2, 7, 8, 13); qr(3, 4, 9, 14)
    return [(a + b) & 0xFFFFFFFF for a, b in zip(x, st)]

class StdRng:
    def __init__(self, seed):
        self.key = seed_key(seed)
        self.buf = []; self.ctr = 0
    def _refill(self):
        self.buf = []
        for _ in range(4):
            self.buf.extend(chacha_block(self.key, self.ctr)); self.ctr += 1
    def next_u32(self):
        if not self.buf: self._refill()
        return self.buf.pop(0)
    def next_u64(self):
        lo = self.next_u32(); hi = self.next_u32()
        return lo | (hi << 32)
    # Uniform::new(0, 20_000_000) on u64 (rand 0.8.5 UniformInt)
    def uniform_u64(self, rng_range):
        reject = ((M64 - rng_range + 1) + 1 - 1) % rng_range  # (2^64 - range) % range... careful
        # ints_to_reject = (unsigned_max - range + 1) % range, unsigned_max = 2^64-1
        reject = ((M64 - rng_range + 1)) % rng_range
        zone = M64 - reject
        while True:
            v = self.next_u64()
            m = v * rng_range
            lo, hi = m & M64, m >> 64
            if lo <= zone: return hi
    # Uniform::new(0.0, r) f64 (rand 0.8.5 UniformFloat)
    def uniform_f64(self, low, high):
        scale = high - low
        bits = self.next_u64() >> 12
        v12 = struct.unpack("<d", struct.pack("<Q", bits | (1023 << 52)))[0]
        return (v12 - 1.0) * scale + low
    # Standard f64: (next_u64 >> 11) * 2^-53
    def std_f64(self):
        return (self.next_u64() >> 11) * (2.0 ** -53)
    # Open01 f64 (rand 0.8.5): 52-bit mantissa into [1,2) minus (1 - eps/2)
    def open01_f64(self):
        bits = self.next_u64() >> 12
        v12 = struct.unpack("<d", struct.pack("<Q", bits | (1023 << 52)))[0]
        return v12 - (1.0 - 2.220446049250313e-16 / 2.0)

# ---- ziggurat tables (rand's generated ZIG_NORM_X / ZIG_NORM_F) ----
ZIG_R = 3.654152885361008796
ZIG_V = 0.00492867323399
def make_tables():
    f = lambda x: math.exp(-x * x / 2.0)
    f_inv = lambda y: math.sqrt(-2.0 * math.log(y))
    x = [0.0] * 257
    x[0] = ZIG_V / f(ZIG_R)
    x[1] = ZIG_R
    for i in range(2, 256):
        x[i] = f_inv(ZIG_V / x[i - 1] + f(x[i - 1]))
    x[256] = 0.0
    ftab = [f(xi) for xi in x]
    return x, ftab
ZX, ZF = make_tables()

def std_normal(rng):
    while True:
        bits = rng.next_u64()
        i = bits & 0xFF
        u = struct.unpack("<d", struct.pack("<Q", (bits >> 12) | (1024 << 52)))[0] - 3.0
        x = u * ZX[i]
        if abs(x) < ZX[i + 1]: return x
        if i == 0:
            # rand_distr 0.4.3 normal.rs zero_case: both draws Open01, x then
            # y; returns x - R for the negative tail, R - x for the positive
            # (x = ln(open01)/R is <= 0)
            while True:
                x_ = math.log(rng.open01_f64()) / ZIG_R
                y_ = math.log(rng.open01_f64())
                if -2.0 * y_ >= x_ * x_:
                    return x_ - ZIG_R if u < 0.0 else ZIG_R - x_
        if ZF[i + 1] + (ZF[i] - ZF[i + 1]) * rng.std_f64() < math.exp(-x * x / 2.0):
            return x

# ---- MinHasher / EuclideanHasher ----
def minhash_bands(shingles, band_count, band_size, seed):
    rng = StdRng(seed)
    out = []
    for _ in range(band_count):
        seeds = [rng.uniform_u64(20000000) for _ in range(band_size)]
        minima = []
        for s in seeds:
            m = M64
            for item in shingles:
                h = Fx().add(s).add(item).fin()
                if h < m: m = h
            minima.append(m)
        f = Fx()
        for m in minima: f.add(m)
        out.append(f.fin())
    return out

def euclidean_bands(x, r, band_count, band_size, seed):
    d = len(x)
    rng = StdRng(seed)
    out = []
    for _ in range(band_count):
        A = [[std_normal(rng) for _ in range(band_size)] for _ in range(d)]  # row-major (d, band_size)
        b = [rng.uniform_f64(0.0, r) for _ in range(band_size)]
        comps = []
        for j in range(band_size):
            acc = 0.0
            for k in range(d):
                acc += x[k] * A[k][j]
            v = math.ceil((acc + b[j]) / r)
            comps.append(0 if v < 0 else (int(v) & M64 if v <= M64 else M64))
        f = Fx().add(1).add(band_size)  # ndarray shape-slice hash: len prefix + dim
        for c in comps: f.add(c)
        out.append(f.fin())
    return out

def jaccard(a, b, w):
    A, B = shingles_from_text(a, w), shingles_from_text(b, w)
    if not A or not B: return 0.0
    return len(A & B) / len(A | B)

# ================== golden checks ==================
fails = []
def chk(name, got, want):
    if got != want: fails.append((name, got, want))

chk("min-princeton", minhash_bands(shingles_from_text("Princeton University", 2), 3, 2, 123),
    [6891191098855684803, 6484452798683863108, 14488917645112899542])
names = ["Alice Johnson", "Robert Smith", "Charlotte Brown", "David Martinez",
         "Emily Davis", "Michael Wilson", "Sophia Taylor", "James Anderson",
         "Olivia Thomas", "Benjamin Lee"]
golden_names = [
    [13571929851950895096, 9380027513982184887, 2973452616913389687],
    [8779492002049334510, 6213046290947405081, 13321761559668221936],
    [17147317566672094549, 9868884775472345505, 9544039307031965287],
    [8205471107123956470, 3856457550471365223, 160978381860159594],
    [5031590273592478399, 2643794611755346220, 10496886524478706543],
    [7351019434982270461, 11969544284460938578, 1096653296545732983],
    [947309311728102588, 6485027977500841069, 11465726828575944543],
    [6511242524203601686, 5368660891928216176, 4531328875985401258],
    [6134578107120707744, 8471287122008225606, 13561556383590060017],
    [7926739398273580158, 2501438919389423193, 17085734390799214704]]
for n, g in zip(names, golden_names):
    chk(f"min-{n}", minhash_bands(shingles_from_text(n, 2), 3, 2, 123), g)
chk("min-shingles", minhash_bands(shingles_from_list(
    ["Today is", "is such", "such a", "a beautiful", "beautiful day"]), 3, 2, 123),
    [9974840119851185478, 4711155484753061995, 16211519798383806619])
chk("min-shingles2", minhash_bands(shingles_from_list(
    ["Jane was", "was happy", "happy to", "to hear", "hear the", "the news"]), 3, 2, 123),
    [2354814969659523670, 7221458756809834639, 17094615994155466934])
chk("min-empty", minhash_bands(shingles_from_text("", 2), 3, 2, 123),
    [15973479568771280466] * 3)

vecs = [[1.1, 2.2, 3.3, 5.8, 3.9], [4.5, 5.5, 2.3, 1.8, 6.3],
        [7.3, 1.2, 9.6, 5.5, 7.8], [6.7, 4.5, 1.3, 0.6, 4.6]]
golden_euc = [[4153593470791884295, 13333357882440433242],
              [9539244981710099531, 8978554412800410753],
              [3765229951789618540, 13117769235920535871],
              [13333357882440433242, 2643848813970240984]]
for v, g in zip(vecs, golden_euc):
    chk(f"euc-{v}", euclidean_bands(v, 0.5, 2, 3, 123), g)

jac_pairs = [("Princeton University", "Harvard University", 0.4),
             ("Charlotte Brown", "Charlene Browning", 0.5),
             ("David Martinez", "Davis Martin", 0.6),
             ("Olivia Thomas", "Olive Thomason", 0.5625),
             ("Emily Davis", "Laura Bennett", 0.0),
             ("Michael Wilson", "Mike Wilson", 0.4375),
             ("James Anderson", "Jamie Anders", 0.5),
             ("Benjamin Lee", "Christopher Grant", 0.0)]
for a, b, g in jac_pairs:
    chk(f"jac-{a}", jaccard(a, b, 2), g)

if fails:
    for n, got, want in fails:
        print(f"FAIL {n}\n  got  {got}\n  want {want}")
    print(f"{len(fails)} FAILURES")
else:
    print("ALL GOLDEN VECTORS MATCH")
