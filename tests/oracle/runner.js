'use strict'
// Differential-oracle runner: reads JSON cases on stdin, builds contracts
// with the ACTUAL reference library (/root/reference), checks the decoded
// value, prints one JSON result line per case: {id, ok, message}.
//
// Contract spec mini-language (shared with tests/oracle/specs.py):
//   {t:'string'|'number'|'integer'|'bool'|'date'|'any'|'nothing'|'falsy'|'truthy'}
//   {t:'value', v} {t:'oneOf', vs:[..]} {t:'matches', pattern, flags}
//   {t:'and'|'silentAnd'|'or', cs:[..]}
//   {t:'array', item} {t:'tuple', cs:[..], strict} {t:'hash', value}
//   {t:'object', fields:{k: spec}, strict} {t:'toContract', v} {t:'fromExample', v, q}
//   any spec + {optional:true} and/or {rename:'name'}
// Value encoding: plain JSON plus {__nan__:1} {__undef__:1} {__inf__:1|-1}
//   {__date__:'iso'} wrappers.

const c = require('/root/reference/index.js')

function decodeValue(v) {
  if (v === null || typeof v !== 'object') return v
  if (v.__nan__) return NaN
  if (v.__undef__) return undefined
  if (v.__inf__) return v.__inf__ > 0 ? Infinity : -Infinity
  if (v.__date__) return new Date(v.__date__)
  if (v.__fn_this__ !== undefined) {
    // a stub whose result reads a field off `this`
    return function () { return this[v.__fn_this__] }
  }
  if (v.__fn__ !== undefined) {
    const r = decodeValue(v.__fn__)
    return function () { return r }
  }
  if (v.__contract__ !== undefined) return buildContract(v.__contract__)
  if (Array.isArray(v)) return v.map(decodeValue)
  const out = {}
  for (const k of Object.keys(v)) out[k] = decodeValue(v[k])
  return out
}

function buildContract(spec) {
  let base
  switch (spec.t) {
    case 'any': base = c.any; break
    case 'nothing': base = c.nothing; break
    case 'falsy': base = c.falsy; break
    case 'truthy': base = c.truthy; break
    case 'string': base = c.string; break
    case 'number': base = c.number; break
    case 'integer': base = c.integer; break
    case 'bool': base = c.bool; break
    case 'date': base = c.date; break
    case 'contract': base = c.contract; break
    case 'value': base = c.value(decodeValue(spec.v)); break
    case 'oneOf': base = c.oneOf.apply(null, spec.vs.map(decodeValue)); break
    case 'matches': base = c.matches(new RegExp(spec.pattern, spec.flags || '')); break
    case 'and': base = c.and.apply(null, spec.cs.map(buildContract)); break
    case 'silentAnd': base = c.silentAnd.apply(null, spec.cs.map(buildContract)); break
    case 'or': base = c.or.apply(null, spec.cs.map(buildContract)); break
    case 'array': base = c.array(buildContract(spec.item)); break
    case 'tuple': {
      base = c.tuple.apply(null, spec.cs.map(buildContract))
      if (spec.strict) base = base.strict()
      break
    }
    case 'hash': base = c.hash(buildContract(spec.value)); break
    case 'object': {
      const fields = {}
      for (const k of Object.keys(spec.fields || {})) {
        fields[k] = buildContract(spec.fields[k])
      }
      base = c.object(fields)
      if (spec.extend) {
        const ext = {}
        for (const k of Object.keys(spec.extend)) ext[k] = buildContract(spec.extend[k])
        base = base.extend(ext)
      }
      if (spec.strict) base = base.strict()
      if (spec.extendAfterStrict) {
        const ext = {}
        for (const k of Object.keys(spec.extendAfterStrict)) {
          ext[k] = buildContract(spec.extendAfterStrict[k])
        }
        base = base.extend(ext)
      }
      break
    }
    case 'toContract': base = c.toContract(decodeValue(spec.v)); break
    case 'fromExample': base = c.fromExample(decodeValue(spec.v), !!spec.q); break
    case 'fn': {
      base = c.fn.apply(null, (spec.args || []).map(buildContract))
      if (spec.returns) base = base.returns(buildContract(spec.returns))
      if (spec.extraArgs) base = base.extraArgs(buildContract(spec.extraArgs))
      if (spec.thisArg) base = base.thisArg(buildContract(spec.thisArg))
      break
    }
    case 'fun':
    case 'method': {
      const specs = (spec.named || []).map(pair => {
        const o = {}
        o[pair[0]] = buildContract(pair[1])
        return o
      })
      base =
        spec.t === 'method'
          ? c.method.apply(null, [buildContract(spec.ths)].concat(specs))
          : c.fun.apply(null, specs)
      if (spec.returns) base = base.returns(buildContract(spec.returns))
      if (spec.extraArgs) base = base.extraArgs(buildContract(spec.extraArgs))
      if (spec.thisArg) base = base.thisArg(buildContract(spec.thisArg))
      break
    }
    default: throw new Error('unknown spec ' + spec.t)
  }
  if (spec.rename) base = base.rename(spec.rename)
  if (spec.optional) base = base.optional()
  return base
}

let input = ''
process.stdin.on('data', d => (input += d))
process.stdin.on('end', () => {
  const cases = JSON.parse(input)
  const results = []
  for (const tc of cases) {
    let res
    try {
      const contract = buildContract(tc.contract)
      if (tc.invoke) {
        // container-wrap case: wrap a data value holding functions, then
        // call the member at `path` with `args` (and optional this)
        const data = decodeValue(tc.value)
        try {
          const wrapped = contract.wrap(data, tc.name)
          let target = wrapped
          for (const p of tc.invoke.path) target = target[p]
          const ths =
            tc.invoke.this_obj !== undefined
              ? decodeValue(tc.invoke.this_obj)
              : null
          target.apply(ths, (tc.invoke.args || []).map(decodeValue))
          res = { id: tc.id, ok: true, message: null,
                  tostring: contract.toString() }
        } catch (e) {
          res = { id: tc.id, ok: false, message: e.message, name: e.name,
                  tostring: contract.toString() }
        }
      } else if (tc.call) {
        // function-contract case: wrap a stub fn and call it
        const impl =
          tc.impl_this_field !== undefined
            ? function () { return this[tc.impl_this_field] }
            : function () { return decodeValue(tc.impl_returns) }
        try {
          const wrapped = contract.wrap(impl, tc.name)
          const ths =
            tc.this_obj !== undefined ? decodeValue(tc.this_obj) : null
          wrapped.apply(ths, tc.call.map(decodeValue))
          res = { id: tc.id, ok: true, message: null,
                  tostring: contract.toString() }
        } catch (e) {
          res = { id: tc.id, ok: false, message: e.message, name: e.name,
                  tostring: contract.toString() }
        }
      } else {
        const data = decodeValue(tc.value)
        try {
          contract.check(data, tc.name)
          res = { id: tc.id, ok: true, message: null, tostring: contract.toString() }
        } catch (e) {
          res = { id: tc.id, ok: false, message: e.message, name: e.name,
                  tostring: contract.toString() }
        }
      }
    } catch (e) {
      res = { id: tc.id, ok: false, message: 'BUILD_ERROR: ' + e.message }
    }
    results.push(res)
  }
  process.stdout.write(JSON.stringify(results))
})
