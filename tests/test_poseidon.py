"""Poseidon parity tests.

Pins the reference's exact test vectors (SURVEY.md §4.2):
  * Grain-LFSR stream values (src/sponge/poseidon/grain_lfsr.rs:190-218)
  * default-parameter ark/mds heads for rates 2-8 x 2 goals
    (src/sponge/poseidon/traits.rs:163-358)
  * sponge squeeze outputs (src/sponge/poseidon/mod.rs:381-404)
plus host-vs-device cross-model fuzzing (tests.rs:68-240 pattern).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from crypto_primitives_tpu.models.sponge import (
    Felt,
    PoseidonSponge,
    PoseidonSpongeBatch,
    get_default_poseidon_parameters,
)
from crypto_primitives_tpu.models.sponge.grain_lfsr import PoseidonGrainLFSR
from crypto_primitives_tpu.ops.fields_known import BLS12_381_FR as FR


def test_grain_lfsr_consistency():
    # src/sponge/poseidon/grain_lfsr.rs:190-218
    lfsr = PoseidonGrainLFSR(False, 255, 3, 8, 31)
    assert lfsr.get_field_elements_rejection_sampling(FR.p, 1)[0] == int(
        "27117311055620256798560880810000042840428971800021819916023577129547249660720"
    )
    assert lfsr.get_field_elements_rejection_sampling(FR.p, 1)[0] == int(
        "51641662388546346858987925410984003801092143452466182801674685248597955169158"
    )
    assert lfsr.get_field_elements_mod_p(FR.p, 1)[0] == int(
        "30468495022634911716522728179277518871747767531215914044579216845399211650580"
    )
    assert lfsr.get_field_elements_mod_p(FR.p, 1)[0] == int(
        "17250718238509906485015112994867732544602358855445377986727968022920517907825"
    )


# (rate, optimized_for_weights) -> (ark[0][0], mds[0][0]) pinned from
# src/sponge/poseidon/traits.rs:163-358
DEFAULT_PARAM_VECTORS = {
    (2, False): (
        "27117311055620256798560880810000042840428971800021819916023577129547249660720",
        "26017457457808754696901916760153646963713419596921330311675236858336250747575",
    ),
    (3, False): (
        "11865901593870436687704696210307853465124332568266803587887584059192277437537",
        "18791275321793747281053101601584820964683215017313972132092847596434094368732",
    ),
    (4, False): (
        "41775194144383840477168997387904574072980173775424253289429546852163474914621",
        "42906651709148432559075674119637355642263148226238482628104108168707874713729",
    ),
    (5, False): (
        "24877380261526996562448766783081897666376381975344509826094208368479247894723",
        "30022080821787948421423927053079656488514459012053372877891553084525866347732",
    ),
    (6, False): (
        "37928506567864057383105673253383925733025682403141583234734361541053005808936",
        "49124738641420159156404016903087065194698370461819821829905285681776084204443",
    ),
    (7, False): (
        "37848764121158464546907147011864524711588624175161409526679215525602690343051",
        "28113878661515342855868752866874334649815072505130059513989633785080391114646",
    ),
    (8, False): (
        "51456871630395278065627483917901523970718884366549119139144234240744684354360",
        "12929023787467701044434927689422385731071756681420195282613396560814280256210",
    ),
    (2, True): (
        "25126470399169474618535500283750950727260324358529540538588217772729895991183",
        "46350838805835525240431215868760423854112287760212339623795708191499274188615",
    ),
    (3, True): (
        "16345358380711600255519479157621098002794924491287389755192263320486827897573",
        "37432344439659887296708509941462699942272362339508052702346957525719991245918",
    ),
    (4, True): (
        "2997721997773001075802235431463112417440167809433966871891875582435098138600",
        "43959024692079347032841256941012668338943730711936867712802582656046301966186",
    ),
    (5, True): (
        "28142027771717376151411984909531650866105717069245696861966432993496676054077",
        "13157425078305676755394500322568002504776463228389342308130514165393397413991",
    ),
    (6, True): (
        "7417004907071346600696060525974582183666365156576759507353305331252133694222",
        "51393878771453405560681338747290999206747890655420330824736778052231938173954",
    ),
    (7, True): (
        "47093173418416013663709314805327945458844779999893881721688570889452680883650",
        "51455917624412053400160569105425532358410121118308957353565646758865245830775",
    ),
    (8, True): (
        "16478680729975035007348178961232525927424769683353433314299437589237598655079",
        "39160448583049384229582837387246752222769278402304070376350288593586064961857",
    ),
}


@pytest.mark.parametrize("rate", [2, 3, 4, 5, 6, 7, 8])
@pytest.mark.parametrize("weights", [False, True])
def test_default_parameters(rate, weights):
    cfg = get_default_poseidon_parameters(FR, rate, weights)
    ark00, mds00 = DEFAULT_PARAM_VECTORS[(rate, weights)]
    assert cfg.ark[0][0] == int(ark00)
    assert cfg.mds[0][0] == int(mds00)
    assert cfg.capacity == 1 and cfg.rate == rate


def test_poseidon_sponge_consistency_host():
    # src/sponge/poseidon/mod.rs:381-404
    cfg = get_default_poseidon_parameters(FR, 2, False)
    sponge = PoseidonSponge(cfg)
    sponge.absorb([Felt(0), Felt(1), Felt(2)])
    res = sponge.squeeze_native_field_elements(3)
    assert res[0] == int(
        "40442793463571304028337753002242186710310163897048962278675457993207843616876"
    )
    assert res[1] == int(
        "2664374461699898000291153145224099287711224021716202960480903840045233645301"
    )
    assert res[2] == int(
        "50191078828066923662070228256530692951801504043422844038937334196346054068797"
    )


def test_poseidon_sponge_consistency_device():
    """Same pinned vectors through the batched device sponge."""
    cfg = get_default_poseidon_parameters(FR, 2, False)
    B = 4
    sponge = PoseidonSpongeBatch(cfg, batch_shape=(B,))
    elems = jnp.asarray(FR.pack([[0, 1, 2]] * B))  # (B, 3, L)
    sponge.absorb(elems)
    out = sponge.squeeze_native_field_elements(3)  # (B, 3, L)
    vals = FR.unpack(np.asarray(out))
    for b in range(B):
        assert vals[b][0] == int(
            "40442793463571304028337753002242186710310163897048962278675457993207843616876"
        )
        assert vals[b][2] == int(
            "50191078828066923662070228256530692951801504043422844038937334196346054068797"
        )


def test_demo_bug_schedules_match_reference_semantics(rng):
    """src/sponge/poseidon/tests.rs:12-65: split squeezes must agree with the
    batched squeeze for 1+1+1 and 2+1 splits."""
    cfg = get_default_poseidon_parameters(FR, 2, False)
    inputs = [Felt(rng.randrange(FR.p)) for _ in range(3)]

    def fresh():
        s = PoseidonSponge(cfg)
        s.absorb(inputs)
        return s

    e0 = fresh().squeeze_native_field_elements(3)
    s = fresh()
    e1 = (
        s.squeeze_native_field_elements(1)
        + s.squeeze_native_field_elements(1)
        + s.squeeze_native_field_elements(1)
    )
    s = fresh()
    e2 = s.squeeze_native_field_elements(2) + s.squeeze_native_field_elements(1)
    assert e0 == e1 == e2


def test_host_vs_device_fuzz(rng):
    """Cross-model fuzz (tests.rs:68-240 pattern, host oracle vs device)."""
    cfg = get_default_poseidon_parameters(FR, 2, False)
    host = PoseidonSponge(cfg)
    dev = PoseidonSpongeBatch(cfg, batch_shape=())
    for _ in range(25):
        if rng.random() < 0.5:
            n = rng.randrange(0, cfg.rate * 2 + 2)
            vals = [rng.randrange(FR.p) for _ in range(n)]
            host.absorb_elements(vals)
            if n:
                dev.absorb(jnp.asarray(FR.pack([vals])[0]))
        if rng.random() < 0.5:
            n = rng.randrange(1, cfg.rate * 2 + 2)
            out_h = host.squeeze_native_field_elements(n)
            out_d = FR.unpack(np.asarray(dev.squeeze_native_field_elements(n)))
            assert list(out_d) == out_h


def test_squeeze_bytes_and_bits(rng):
    cfg = get_default_poseidon_parameters(FR, 2, False)
    s1 = PoseidonSponge(cfg)
    s1.absorb([Felt(7)])
    b = s1.squeeze_bytes(50)
    assert len(b) == 50
    s2 = PoseidonSponge(cfg)
    s2.absorb([Felt(7)])
    bits = s2.squeeze_bits(100)
    assert len(bits) == 100
    # first squeezed element must be consistent between the two views
    s3 = PoseidonSponge(cfg)
    s3.absorb([Felt(7)])
    e = s3.squeeze_native_field_elements(1)[0]
    assert b[:31] == FR.to_bytes_le(e)[:31]
    assert bits[:100] == [bool((e >> i) & 1) for i in range(100)]


def test_squeeze_cast_native(rng):
    # tests.rs:306-319: native squeeze == squeeze_field_elements to same field
    cfg = get_default_poseidon_parameters(FR, 2, False)
    elem = Felt(rng.randrange(FR.p))
    s1 = PoseidonSponge(cfg)
    s1.absorb(elem)
    s2 = s1.clone()
    assert s1.squeeze_native_field_elements(5) == s2.squeeze_field_elements(5, FR)


def test_sponge_state_roundtrip(rng):
    # SpongeExt twin (src/sponge/mod.rs:184-191)
    cfg = get_default_poseidon_parameters(FR, 2, False)
    s = PoseidonSponge(cfg)
    s.absorb([Felt(1), Felt(2), Felt(3)])
    st = s.clone().into_state()
    s2 = PoseidonSponge.from_state(st, cfg)
    assert s.squeeze_native_field_elements(4) == s2.squeeze_native_field_elements(4)


def test_fork_domain_separation():
    cfg = get_default_poseidon_parameters(FR, 2, False)
    s = PoseidonSponge(cfg)
    s.absorb([Felt(5)])
    f1 = s.fork(b"domain-a")
    f2 = s.fork(b"domain-b")
    assert f1.squeeze_native_field_elements(2) != f2.squeeze_native_field_elements(2)
