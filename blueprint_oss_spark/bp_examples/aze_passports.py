"""The reference's AZE passport model, re-expressed in this DSL.

Reference: examples/passports/aze_passports.py:1-53 — seven
label-value sub-extractions (surname, given name, place/date of birth,
date of expiry/issue, sex) combined with auto-injected disjointness.
Sample inputs: examples/passports/hocr/*.jpg.hocr (MIDV-2020 templates,
vldb22.md:12-33).

Ported model definition: the rule constants and layout structure are
the workload itself and match the MIT-licensed reference example by
design (parity with that model is the goal); the engine executing it
is this repo's own."""

from ..model.nodes import combine, extract
from ..model.rules import (
    is_date, is_top_down_label_value_pair, text_equals,
)

sn = extract(
    text_equals('Soyadi/Surname')('sn_label'),
    is_top_down_label_value_pair('sn_label', 'sn'),
)

fn = extract(
    text_equals('Adi, atasinin adi/Given name, patronymic',
                taper=4)('fn_label'),
    is_top_down_label_value_pair('fn_label', 'fn'),
)

pob = extract(
    text_equals('Doguldugu yer/Place of birth', taper=8)('pob_label'),
    is_top_down_label_value_pair('pob_label', 'pob'),
)

dob = extract(
    text_equals('Doguldugu tarix/Date of birth', taper=4)('dob_label'),
    is_date('dob'),
    is_top_down_label_value_pair('dob_label', 'dob'),
)

doe = extract(
    is_date('doe'),
    is_top_down_label_value_pair('doe_label', 'doe'),
    text_equals('Etibarliliq muddati/Date of expiry',
                taper=4)('doe_label'),
)

doi = extract(
    text_equals('Verilma tarixi/Date of issue', taper=4)('doi_label'),
    is_date('doi'),
    is_top_down_label_value_pair('doi_label', 'doi'),
)

sex = extract(
    is_top_down_label_value_pair('sex_label', 'sex'),
    text_equals('Cinsi/Sex', taper=3)('sex_label'),
)

aze = combine(sn, fn, doe, dob, doi, sex, pob).with_name('AZE')
root = aze
